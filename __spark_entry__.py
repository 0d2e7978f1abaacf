"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the full KG-construction pipeline on sf0.001 and
returns the per-predicate edge summary (the analogue of the reference's scan
summary, src/index.ts:230-238). ``queries()`` exposes one entry per
implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the matching
DuckDB statement over the driver's pre-registered parquet views.

The transcripts input (BASELINE.json input_hint shape) is synthesized
deterministically from the ``documents`` view with transforms expressible
identically in Spark and DuckDB — see
glasseenterprise_mcp_spark/sources/transcripts.py.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from glasseenterprise_mcp_spark import oracle as O
from glasseenterprise_mcp_spark.operators.canonicalize import (
    connected_components,
    resolve_identities,
)
from glasseenterprise_mcp_spark.operators.extract import extract_mentions
from glasseenterprise_mcp_spark.operators.link import (
    calls_tool_edges,
    mentions_in_edges,
    refers_to_edges,
    replies_to_edges,
)
from glasseenterprise_mcp_spark.operators.materialize import build_nodes
from glasseenterprise_mcp_spark.pipeline import run_pipeline
from glasseenterprise_mcp_spark.sources.transcripts import derive_transcripts

SNAP = "test-snapshot"


def _t(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_transcripts(spark, sf_dir)


def _m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_mentions(_t(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline at sf0.001 → per-predicate triple counts."""
    t = derive_transcripts(spark, "/root/testdata/sf0.001")
    res = run_pipeline(spark, t, sink=None, snapshot_version=SNAP)
    return res.edges.groupBy("pred").agg(F.count(F.lit(1)).cast("long").alias("n")).orderBy("pred")


# --------------------------------------------------------------------------
# queries: one entry per operator (SURVEY.md §2 ids in the names)
# --------------------------------------------------------------------------
def q_transcripts(spark, sf_dir):
    return _t(spark, sf_dir).select("conv_id", "turn_idx", "role", "text", "tool", "ts_epoch")


def q_mentions(spark, sf_dir):
    return _m(spark, sf_dir).select("conv_id", "turn_idx", "mtype", "surface", "norm", "ord", "path")


def q_mentions_by_type(spark, sf_dir):
    return (
        _m(spark, sf_dir)
        .groupBy("mtype")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_mentions_in(spark, sf_dir):
    return mentions_in_edges(_m(spark, sf_dir))


def q_replies_to(spark, sf_dir):
    t = _t(spark, sf_dir)
    return replies_to_edges(t, extract_mentions(t))


def q_calls_tool(spark, sf_dir):
    t = _t(spark, sf_dir)
    return calls_tool_edges(t, extract_mentions(t))


def q_refers_to(spark, sf_dir):
    return refers_to_edges(_m(spark, sf_dir))


def q_connected_components(spark, sf_dir):
    e = refers_to_edges(_m(spark, sf_dir))
    return connected_components(e.select("subj", "obj"), src="subj", dst="obj")


def q_identity_resolution(spark, sf_dir):
    return resolve_identities(_m(spark, sf_dir)).select(
        "norm", "display", "n_mentions", "n_surfaces"
    )


def q_nodes(spark, sf_dir):
    t = _t(spark, sf_dir)
    return build_nodes(t, extract_mentions(t), SNAP).select(
        "id", "type", "name", "norm", "first_conv", "first_turn"
    )


def q_count_by_label(spark, sf_dir):
    t = _t(spark, sf_dir)
    return (
        build_nodes(t, extract_mentions(t), SNAP)
        .groupBy("type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s1_transcripts_scan": q_transcripts,
        "e1_extract_mentions": q_mentions,
        "a8_mentions_by_type": q_mentions_by_type,
        "j1_mentions_in": q_mentions_in,
        "w4_replies_to": q_replies_to,
        "j5_calls_tool": q_calls_tool,
        "j20_refers_to_tiered": q_refers_to,
        "g4_connected_components": q_connected_components,
        "a4_identity_resolution": q_identity_resolution,
        "d_nodes_materialize": q_nodes,
        "a8_count_by_label": q_count_by_label,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "s1_transcripts_scan": O.oracle(
            "SELECT conv_id, turn_idx, role, text, tool, ts_epoch FROM transcripts"
        ),
        "e1_extract_mentions": O.oracle(
            "SELECT conv_id, turn_idx, mtype, surface, norm, ord, path FROM mentions"
        ),
        "a8_mentions_by_type": O.oracle(
            "SELECT mtype, CAST(COUNT(*) AS BIGINT) AS n FROM mentions GROUP BY mtype"
        ),
        "j1_mentions_in": O.oracle(
            "SELECT subj, pred, obj, subj_kind FROM mentions_in", O.mentions_in_cte()
        ),
        "w4_replies_to": O.oracle(
            "SELECT subj, pred, obj, mode FROM replies_to", O.replies_to_cte()
        ),
        "j5_calls_tool": O.oracle(
            "SELECT subj, pred, obj, via FROM calls_tool", O.calls_tool_cte()
        ),
        "j20_refers_to_tiered": O.oracle(
            "SELECT subj, pred, obj, confidence, tier FROM refers_to", O.refers_to_cte()
        ),
        "g4_connected_components": O.oracle(
            "SELECT id, comp FROM cc",
            O.refers_to_cte(),
            O.connected_components_cte("refers_to"),
        ),
        "a4_identity_resolution": O.oracle(
            "SELECT norm, display, n_mentions, n_surfaces FROM identities",
            O.resolve_identities_cte(),
        ),
        "d_nodes_materialize": O.oracle(
            "SELECT id, type, name, norm, first_conv, first_turn FROM nodes",
            O.nodes_cte(),
        ),
        "a8_count_by_label": O.oracle(
            "SELECT type, CAST(COUNT(*) AS BIGINT) AS n FROM nodes GROUP BY type",
            O.nodes_cte(),
        ),
    }
