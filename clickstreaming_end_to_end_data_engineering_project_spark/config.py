"""Environment-variable configuration — the engine twin of the
reference's ``config.py`` (all defaults cited from /root/reference/config.py).

Same env names where the concept carries over, so a deployment's
existing environment keeps working; connection settings for services
this engine writes through sinks (Kafka/JDBC/metrics store) live here
too.  Everything is a frozen dataclass loaded once at import of the
caller's choosing — no hidden global state.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass(frozen=True)
class KafkaConfig:
    # reference config.py:10-16
    bootstrap_servers: str = field(default_factory=lambda: _env("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092"))
    topic: str = field(default_factory=lambda: _env("KAFKA_TOPIC", "clickstream"))
    group_id: str = field(default_factory=lambda: _env("KAFKA_GROUP_ID", "clickstream-processor"))


@dataclass(frozen=True)
class JdbcConfig:
    # reference config.py:19-27 (Postgres)
    url: str = field(default_factory=lambda: _env("JDBC_URL", "jdbc:postgresql://localhost:5432/clickstream"))
    user: str = field(default_factory=lambda: _env("JDBC_USER", "postgres"))
    password: str = field(default_factory=lambda: _env("JDBC_PASSWORD", ""))

    def properties(self) -> dict:
        return {"user": self.user, "password": self.password, "driver": "org.postgresql.Driver"}


@dataclass(frozen=True)
class MetricsConfig:
    # reference config.py:30-36 (Redis) + TTL at stream_processor.py:388
    host: str = field(default_factory=lambda: _env("METRICS_HOST", "localhost"))
    port: int = field(default_factory=lambda: int(_env("METRICS_PORT", "6379")))
    ttl_seconds: int = field(default_factory=lambda: int(_env("METRICS_TTL_SECONDS", "86400")))


@dataclass(frozen=True)
class SparkConfig:
    # reference config.py:48-54
    batch_duration_s: int = field(default_factory=lambda: int(_env("SPARK_BATCH_DURATION", "5")))
    shuffle_partitions: int = field(default_factory=lambda: int(_env("SPARK_SHUFFLE_PARTITIONS", _env("SPARK_GRAFT_CPUS", "32"))))
    max_offsets_per_trigger: int = field(default_factory=lambda: int(_env("MAX_OFFSETS_PER_TRIGGER", "10000")))
    checkpoint_dir: str = field(default_factory=lambda: _env("CHECKPOINT_DIR", "/tmp/clickstream_checkpoints"))


@dataclass(frozen=True)
class GeneratorConfig:
    # reference config.py:57-63
    events_per_second: float = field(default_factory=lambda: float(_env("EVENTS_PER_SECOND", "20")))
    num_users: int = field(default_factory=lambda: int(_env("NUM_USERS", "1000")))
    seed: int = field(default_factory=lambda: int(_env("GENERATOR_SEED", "42")))


@dataclass(frozen=True)
class EngineConfig:
    kafka: KafkaConfig = field(default_factory=KafkaConfig)
    jdbc: JdbcConfig = field(default_factory=JdbcConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    spark: SparkConfig = field(default_factory=SparkConfig)
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)


def load_config() -> EngineConfig:
    return EngineConfig()
