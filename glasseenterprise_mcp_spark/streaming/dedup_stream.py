"""Streaming exact dedup: ``dropDuplicatesWithinWatermark`` keyed on the
content hash — the streaming twin of ``operators/dedup.exact_dedup``'s
keep-first semantics, for ingest-time dedup of a live training-data feed
(SURVEY.md §2.9 × the dedup family; the reference's incremental watcher
re-scans changed files, this is the analogous only-new-content contract).

Semantics: exactly ONE representative per content hash is emitted; any
further occurrence arriving within the watermark delay of the event-time
column is dropped. WITHIN a micro-batch the surviving representative is
processing-order-dependent (Spark does not sort the batch by event time
before deduping — so it is "one per hash", not "event-time-first");
ACROSS batches the earlier batch's representative always wins because the
hash is already in state. A duplicate arriving LATER than the watermark
may be re-emitted — that is the documented bound that keeps state finite
(state per live hash only, evicted at the watermark), which is what makes
the operator viable on an unbounded 100TB/day feed where an unbounded
``dropDuplicates`` would accumulate every hash ever seen. Keys are md5
hashes, so the state store's hash partitioning is uniform by construction
— no hot state partition.

Batch parity: over a bounded replay whose duplicates all fall inside the
watermark, the emitted TEXT set equals ``exact_dedup``'s distinct hashes
(pinned by tests/test_streaming.py::test_dedup_stream_drops_in_watermark_dups).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def dedup_stream(docs, watermark: str = "10 minutes"):
    """docs: streaming DataFrame with (doc_id long, text string, ts
    timestamp). Returns the append-mode stream of first-seen documents."""
    return (
        docs.withColumn("text_hash", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def run_dedup_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """File-source driver: watch ``source_dir`` for (doc_id, text, ts)
    parquet, emit first-seen docs to ``out_dir``, checkpointed,
    availableNow (drain-and-stop)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        dedup_stream(stream, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
