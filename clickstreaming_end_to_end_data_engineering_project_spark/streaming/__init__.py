from .pipelines import ClickstreamPipelines  # noqa: F401
from .sinks import MemorySink, ParquetSink, Sink  # noqa: F401
