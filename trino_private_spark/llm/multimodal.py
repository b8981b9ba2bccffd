"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no codec libraries, so the *decode* kernels are stubbed
(deterministic fakes clearly marked below); everything Spark-side — schema,
partition sizing, Arrow batch shape, mapInPandas signatures — is real and
tested. Swap `_decode_image_stub` for a PIL/ffmpeg call and the pipeline is
production-shaped.

Scale notes: media rows are large and skew-prone. ``pack_media`` keeps the
binary payload in its own column so Parquet stores it as one chunk and
column pruning skips it unless asked for; ``repartition_for_media`` sizes
partitions by payload bytes (not row count) so one Arrow batch stays within
executor memory at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
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
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB — deterministic fake feature extractor.

    A real implementation would decode the image (PIL/libjpeg), resize, and
    run a feature net. Here: a stable 8-dim byte-histogram-ish projection so
    tests have deterministic values. Raises on None like a decoder would."""
    if payload is None:
        raise NotImplementedError("no payload; real decoder requires bytes")
    buckets = [0] * 8
    for b in payload:
        buckets[b & 7] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in buckets]


def extract_features(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over media rows via mapInPandas.

    mapInPandas (not a scalar pandas_udf) because media decode is
    per-row-expensive and benefits from generator-style batching; the small
    ``batch_rows`` cap bounds the bytes per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _decode_image_stub(p) if p is not None else None
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def repartition_for_media(df: DataFrame, target_bytes: int = 64 * 1024 * 1024,
                          payload_col: str = "payload") -> DataFrame:
    """Repartition so each partition carries ~target_bytes of payload —
    byte-based sizing, since media row counts say nothing about memory."""
    stats = df.select(
        F.sum(F.length(F.col(payload_col)).cast("bigint")).alias("total")
    ).collect()[0]
    total = stats["total"] or 0
    n = max(1, int(total / max(target_bytes, 1)) + 1)
    return df.repartition(n)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_ts_ms) rows from
    metadata only — no decode. The downstream decode step is the stubbed
    pandas UDF. sequence() is JVM-side, so the expansion never touches Python."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.coalesce(F.col("meta_duration_ms"), F.lit(0)).cast("bigint"),
                    F.lit(every_ms).cast("bigint"),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = patterned bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 7 + j) % 251 for j in range(128 + (i % 5) * 32))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                5000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
