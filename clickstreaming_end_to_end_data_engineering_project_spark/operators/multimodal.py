"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched pandas iterators
(``mapInPandas``) — the only operators in this engine where Python is
the right hot path (byte-level decode has no Spark builtin).

Container note: no image/audio libraries are installed here, so the
actual decode is stubbed (deterministic fake via ``_FakeCodec``, or
``NotImplementedError`` in strict mode).  Everything around the stub —
schemas, partitioning, UDF signatures, Arrow batch shapes — is real
and tested; swapping in PIL/ffmpeg changes only ``_FakeCodec``.

Scale design:
- media rows are WIDE (MBs per row): keep ``spark.sql.files.
  maxPartitionBytes`` at default so a partition holds a bounded number
  of rows, and NEVER collect; all transforms are mapInPandas
  (executor-local, streaming Arrow batches bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``).
- derived features (dims, fingerprints, frame samples) are narrow —
  project them out and write them as a separate table so downstream
  analytics never rescan the blobs (column pruning does the rest).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("phash", StringType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
    ]
)

RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("loudness_bucket", IntegerType(), True),
    ]
)


class _FakeCodec:
    """Deterministic stand-in for PIL/ffmpeg: derives stable pseudo
    properties from the payload bytes.  Real decoders drop in here."""

    @staticmethod
    def image_dims(payload: bytes) -> tuple[int, int]:
        h = hashlib.sha256(payload).digest()
        return 64 + h[0] % 193, 64 + h[1] % 193  # deterministic 64..256

    @staticmethod
    def perceptual_hash(payload: bytes) -> str:
        return hashlib.sha256(payload).hexdigest()[:16]

    @staticmethod
    def video_frames(payload: bytes, every_n: int) -> list[bytes]:
        n_frames = 1 + len(payload) % 7
        return [payload[i : i + 16] for i in range(0, n_frames, every_n)]

    @staticmethod
    def resize(payload: bytes, width: int, height: int) -> bytes:
        # deterministic fake: stretch/truncate the payload to a byte
        # budget proportional to the target raster (1 byte / 64 px) —
        # a real decoder returns the re-encoded image here
        budget = max(1, width * height // 64)
        reps = -(-budget // max(1, len(payload))) if payload else 1
        return ((payload or b"\x00") * reps)[:budget]

    @staticmethod
    def audio_props(payload: bytes) -> tuple[int, int, int]:
        h = hashlib.sha256(payload).digest()
        duration_ms = 500 + int.from_bytes(h[2:4], "big") % 59_500
        sample_rate = (8, 16, 22, 44, 48)[h[4] % 5] * 1000
        loudness_bucket = h[5] % 10
        return duration_ms, sample_rate, loudness_bucket


def image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode-and-measure over Arrow batches: (media_id, width, height,
    n_bytes, phash).  One narrow pass, no shuffle.

    ``strict=True`` raises like a missing-decoder build would — the
    flag is closure-captured (module state does NOT reach Python
    workers; anything the UDF needs must travel in the closure)."""
    import pandas as pd

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        if strict:
            raise NotImplementedError("image decode requires PIL; not in this container")
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [], "phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                w, h = _FakeCodec.image_dims(b)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(b))
                out["phash"].append(_FakeCodec.perceptual_hash(b))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        _extract, IMAGE_FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video → (media_id, frame_idx, frame_bytes) rows; the row-exploding
    shape of a frame sampler (1 input row → N output rows)."""
    import pandas as pd

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for i, fr in enumerate(_FakeCodec.video_frames(b, every_n)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
    )


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, strict: bool = False
) -> DataFrame:
    """Batch image resize to a fixed raster (the pre-training
    normalization step) over Arrow batches: (media_id, width, height,
    payload).  Same 1-row→1-row narrow shape as ``image_features`` —
    output payloads are bounded by the target raster, so the resized
    table is safe to shuffle/write where the raw blobs were not.
    ``strict=True`` raises like a missing-decoder build would."""
    import pandas as pd

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        if strict:
            raise NotImplementedError("image resize requires PIL; not in this container")
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["payload"].append(_FakeCodec.resize(b, width, height))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        _resize, RESIZED_IMAGE_SCHEMA
    )


def audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Audio decode-and-measure over Arrow batches: (media_id,
    duration_ms, sample_rate, n_bytes, loudness_bucket) — the audio
    twin of ``image_features`` (duration/rate gates and loudness
    stratification are the first filters an audio-corpus curation
    pass applies)."""
    import pandas as pd

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        if strict:
            raise NotImplementedError("audio decode requires ffmpeg; not in this container")
        for pdf in batches:
            out = {
                "media_id": [], "duration_ms": [], "sample_rate": [],
                "n_bytes": [], "loudness_bucket": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                dur, rate, loud = _FakeCodec.audio_props(b)
                out["media_id"].append(mid)
                out["duration_ms"].append(dur)
                out["sample_rate"].append(rate)
                out["n_bytes"].append(len(b))
                out["loudness_bucket"].append(loud)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        _extract, AUDIO_FEATURES_SCHEMA
    )


def media_fingerprints(media: DataFrame) -> DataFrame:
    """Exact-dup key over raw payloads — pure built-ins (md5 on binary),
    no Python: dedup of blobs never needs a decode."""
    return media.select(
        "media_id",
        "kind",
        F.md5(F.col("payload")).alias("fingerprint"),
        F.length(F.col("payload")).alias("n_bytes"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture: binary payloads derived from the id."""
    kinds = ["image", "audio", "video"]
    rows = [
        (i, kinds[i % 3], f"x/{kinds[i % 3]}", hashlib.sha256(str(i // 2).encode()).digest() * 4)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
