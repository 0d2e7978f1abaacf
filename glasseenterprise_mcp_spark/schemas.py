"""Normative schemas for the pipeline (SURVEY.md §1.4, FIXTURES.md F1-F4).

transcripts is the input contract (BASELINE.json input_hint); mentions is the
stage-A output (analogue of the reference's per-file findings,
reference: src/scanner/astExtractor.ts:757-795); nodes/edges are the persisted
graph (reference: src/scanner/types.ts:41-51,286-348 and
src/neo4j/saveNodes.ts / saveRelationships.ts).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# events side-table (the testdata events.parquet shape) — used by the
# streaming sketch maintenance readStream source.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

# Stage-A output. ``ord`` is the 1-based occurrence ordinal of the match
# within (turn, mtype) — the cross-engine-stable identity component used in
# place of char offsets for the oracle-checked id (offsets are kept too, but
# only the engine produces them).
MENTIONS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("mtype", StringType()),
        StructField("surface", StringType()),
        StructField("norm", StringType()),
        StructField("ord", IntegerType()),
        StructField("span_start", IntegerType()),
        StructField("span_end", IntegerType()),
        StructField("path", StringType()),  # pre-api-strip path for url/endpoint
        # True for the first occurrence of this mention's NODE KEY within the
        # turn (key = kind + path for urls, kind + norm otherwise). Lets
        # mentions-in skip its global dedup shuffle: (node, turn) pairs are
        # unique by construction when filtered on this flag.
        StructField("first_in_turn", BooleanType()),
        # HTTP verb for url (optional, NULL ⇒ defaulted to GET at link time)
        # and endpoint mentions (N6 method gating, relationshipBuilder.ts:595-602)
        StructField("method", StringType()),
        # auxiliary payload: derive-directive sources csv (J9/J10 lineage)
        StructField("extra", StringType()),
        # pre-minted ids (E16): node kind, md5('<kind>|<key>') and
        # md5('turn|<conv>|<idx>') — minted IN the kernel (memoized per
        # distinct key) so downstream edge families are pure column selects
        # instead of re-hashing the corpus per family. BINARY(16) raw
        # digests (see functions/ids.py) — half the bytes of hex in every
        # downstream shuffle/cache/file; hex is order-preserving so all
        # min/ordering semantics are unchanged.
        StructField("kind", StringType()),
        StructField("node_id", BinaryType()),
        StructField("turn_id", BinaryType()),
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("id", BinaryType()),
        StructField("type", StringType()),
        StructField("name", StringType()),
        StructField("norm", StringType()),
        StructField("key", StringType()),  # the id's preimage (md5('<type>|<key>'))
        StructField("first_conv", StringType()),
        StructField("first_turn", IntegerType()),
        StructField("attrs", MapType(StringType(), StringType())),
        StructField("snapshot_version", StringType()),
    ]
)

EDGES_SCHEMA = StructType(
    [
        StructField("subj", BinaryType()),
        StructField("pred", StringType()),
        StructField("obj", BinaryType()),
        StructField("props", MapType(StringType(), StringType())),
        StructField("snapshot_version", StringType()),
    ]
)

# Per-stage lineage/metrics sidecar (north rule: "every stage writes
# per-partition lineage + metrics").
METRICS_SCHEMA = StructType(
    [
        StructField("snapshot_version", StringType()),
        StructField("stage", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("rows", LongType()),
        StructField("metric", StringType()),
    ]
)

PREDICATES = ("mentions-in", "calls-tool", "replies-to", "refers-to")
