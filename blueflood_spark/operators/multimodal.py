"""Multimodal column operators: image/audio/video as opaque `binary`
columns with typed metadata, processed through Arrow-batched pandas
iterators (`mapInPandas`).

The Spark-side plumbing — schema, batch iteration, partition sizing —
is real and tested. The media decode itself is STUBBED: the runtime here
has no image/audio libraries, so decode functions either raise
`NotImplementedError` (strict mode) or produce a deterministic fake
derived from the bytes (test mode). Swapping in a real decoder (PIL,
torchaudio, pyav) changes only the inner function, not the plan: the
operator is already shaped for 100 TB (mapInPandas streams Arrow batches,
memory bounded by batch size, not partition size; no shuffle introduced).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode→embed step: md5-derived
    floats. Replace with the real library call; the Spark plan is
    unchanged."""
    if payload is None:
        return None
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dims]]


def extract_features(media: DataFrame, strict: bool = False, dims: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas: Arrow batches in, Arrow
    batches out; executor memory is bounded by the Arrow batch size."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "media decode requires an image/audio library not present in this runtime"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(lambda b: _fake_decode(b, dims)),
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def resize_plan(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Resize planning runs JVM-side (pure metadata arithmetic); only the
    pixel work would enter pandas. Emits target dims preserving aspect."""
    scale = F.least(
        F.lit(max_w) / F.col("width"), F.lit(max_h) / F.col("height"), F.lit(1.0)
    )
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
        (F.col("width") * F.col("height") > max_w * max_h).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per planned
    frame timestamp (sequence + explode, JVM-side)."""
    n_frames = F.greatest((F.col("duration_ms") / F.lit(1000.0) * fps).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: (i * F.lit(1000.0 / fps)).cast("long"),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests. The payload is ASCII-hex
    bytes (md5 hex ×5 = 160 bytes) rather than raw binary so the DuckDB
    oracle — whose hash functions take VARCHAR only — can reproduce the
    feature pipeline byte-for-byte; the Spark column is still BINARY and
    the Arrow plumbing is exactly what raw media bytes would traverse."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.md5(f"media_{i}".encode()).hexdigest() * 5).encode()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                (i + 1) * 1500 if kind != "image" else None,
            )
        )
    # one fat partition: pandas batches amortize; each touched partition
    # costs a Python worker round (~0.3s), which dwarfs 100-row compute.
    # repartition, NOT coalesce: under Spark 4.1 coalesce(1) on a local
    # relation falls off the fast path (~4s for 96 rows); the tiny
    # round-robin exchange is ~0.1s and AQE leaves it alone.
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(max(1, n // 2048))
