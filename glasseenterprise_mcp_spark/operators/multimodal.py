"""Multimodal column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as vectorized
``mapInPandas`` stages over Arrow batches (binary travels as zero-copy Arrow
buffers — the only sane way to move blobs through a Python stage).

The actual codec step is STUBBED in this sandbox (no image/audio libs in the
container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder produces
byte-statistics "features" — the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) is real and tested either way.

At 100TB: blobs dominate bytes; the media table is partitioned by
``modality`` and bucketed by ``media_id`` so feature extraction is
embarrassingly parallel and joins back to text tables are co-located;
``spark.sql.files.maxPartitionBytes`` bounds blob-scan partitions;
metadata-only queries prune the ``content`` column at the parquet reader
(columnar projection — verified by ReadSchema in .explain)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
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
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("content", BinaryType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: the text bytes
    ARE the blob (so tests need no binary fixtures)."""
    d = F.col("doc_id")
    modality = (
        F.when(d % 3 == 0, "image").when(d % 3 == 1, "audio").otherwise("video")
    )
    return documents.select(
        d.cast("long").alias("media_id"),
        modality.alias("modality"),
        F.concat(F.lit("x-fake/"), modality).alias("mime"),
        (d % 640 + 16).cast("int").alias("width"),
        (d % 480 + 16).cast("int").alias("height"),
        (d % 9000 + 1000).cast("int").alias("duration_ms"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def _fake_features(buf: bytes, k: int = 8) -> list[float]:
    """Deterministic byte-statistics 'embedding': bucketed byte histogram,
    normalized. Stands in for a real CNN/codec feature vector."""
    counts = [0] * k
    for b in buf:
        counts[b % k] += 1
    n = max(len(buf), 1)
    return [c / n for c in counts]


def extract_features(
    media: DataFrame, fake: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Vectorized decode + feature extraction over Arrow batches.

    ``fake=False`` is the real-codec path — stubbed here:
    raises NotImplementedError (no media libs in this container)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libs not present in "
                    "this sandbox; run with fake=True for the plumbing path"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["content"].map(
                        lambda b: _fake_features(b if b is not None else b"")
                    ),
                }
            )
            yield out

    from ..functions.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    return media.select("media_id", "modality", "content").mapInPandas(
        _batches, schema=FEATURES_SCHEMA
    )


def media_features_int(media: DataFrame) -> DataFrame:
    """Driver-gate projection of extract_features: recover the integer byte
    histogram from the normalized float features (count = round(f * n)) so
    the output is float-free and oracle-comparable. Gates the REAL kernel:
    any drift in the Arrow plumbing or the feature math breaks the counts."""
    f = extract_features(media, fake=True)
    cols = [
        F.round(F.element_at("features", i + 1) * F.col("n_bytes"), 0)
        .cast("long")
        .alias(f"c{i}")
        for i in range(8)
    ]
    return f.select("media_id", "modality", F.col("n_bytes").cast("long"), *cols)


# --------------------------------------------------------------------------
# DuckDB oracle twins (media synthesized from documents is deterministic and
# fully relational; the codec stub stays engine-only and disclosed)
# --------------------------------------------------------------------------
_MODALITY_SQL = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)


def media_metadata_sql() -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       {_MODALITY_SQL} AS modality,
       'x-fake/' || {_MODALITY_SQL} AS mime,
       CAST(doc_id % 640 + 16 AS INT) AS width,
       CAST(doc_id % 480 + 16 AS INT) AS height,
       CAST(doc_id % 9000 + 1000 AS INT) AS duration_ms
FROM documents"""


def frame_sample_sql(every_ms: int = 1000) -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(unnest(range(0, doc_id % 9000 + 1000, {every_ms})) AS INT) AS frame_ts_ms
FROM documents WHERE doc_id % 3 = 2"""


def resize_plan_sql(max_side: int = 256) -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       {_MODALITY_SQL} AS modality,
       CAST(doc_id % 640 + 16 AS INT) AS width,
       CAST(doc_id % 480 + 16 AS INT) AS height,
       CAST(ceil((doc_id % 640 + 16) * least(1.0, {max_side}.0 / greatest(doc_id % 640 + 16, doc_id % 480 + 16))) AS INT) AS target_w,
       CAST(ceil((doc_id % 480 + 16) * least(1.0, {max_side}.0 / greatest(doc_id % 640 + 16, doc_id % 480 + 16))) AS INT) AS target_h
FROM documents"""


def media_features_int_sql() -> str:
    """Byte-histogram twin: documents text is ASCII (verified per-sf), so
    char code points == UTF-8 bytes and ascii(substr(...)) reproduces the
    kernel's byte buckets exactly."""
    buckets = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (b = {i}) AS BIGINT) AS c{i}" for i in range(8)
    )
    return f"""
WITH bytes AS (
  SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) % 8 AS b
  FROM documents, unnest(range(1, length(text)+1)) AS t(i)
)
SELECT CAST(d.doc_id AS BIGINT) AS media_id,
       {_MODALITY_SQL.replace("doc_id", "d.doc_id")} AS modality,
       CAST(length(d.text) AS BIGINT) AS n_bytes,
       {buckets}
FROM documents d JOIN bytes ON bytes.doc_id = d.doc_id
GROUP BY d.doc_id, d.text"""


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan* plumbing: one row per sampled timestamp
    (the decode of the frame itself is the stubbed step). Pure relational
    explode — no Python."""
    v = media.filter(F.col("modality") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata computation (aspect-preserving target dims) as pure
    column math; the pixel work is the stubbed decode step."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return media.select(
        "media_id",
        "modality",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )
