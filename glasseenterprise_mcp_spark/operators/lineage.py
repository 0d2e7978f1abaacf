"""Lineage + security-rule joins (SURVEY.md §2 J9/J10, J17/N5 analogues).

``secures_api``    — the ant-pattern theta join: a tiny security-rule dim
                     (``secure:<ant-pattern>`` mentions) is broadcast against
                     the endpoint registry with a regex match built from the
                     ant pattern (``**`` crosses segments, ``*`` stays inside
                     one); first-match-wins by rule precedence. Analogue of
                     the reference's SECURES_API matching
                     (src/scanner/relationshipBuilder.ts:387-407 join,
                     720-739 antPatternToRegex).

``lineage_triples`` — the nested-lineage explode joins: a ``derive:t<s1,s2``
                     directive carries its sources as an array-of-struct
                     (source, 1-based arg index); exploding it and chaining
                     two joins against the entity registry yields
                     TRANSFORMS / DERIVES_FROM / PASSES_TO triples. Analogue
                     of the reference's dataTransformations / passesTo edges
                     (src/scanner/relationshipBuilder.ts:246-281).

Physical shape notes (100TB): both operators join a *small dim* (distinct
rules / distinct derive directives) against registries that are themselves
dims (distinct endpoints / distinct entity norms) — every join is broadcast-
able; nothing here scales with turn count except the initial distinct.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.ids import node_id_col, node_id_sql
from .link import turn_id_col, turn_id_sql


# --------------------------------------------------------------------------
# J17/N5 — ant-pattern security rules
# --------------------------------------------------------------------------
def _ant_rx_col(p: F.Column) -> F.Column:
    """N5: ant pattern → anchored regex. '.'→'\\.', '**'→'.*', '*'→'[^/]*'.
    The '%%' placeholder survives both replaces because '%' cannot occur in
    the secpat charset. Built identically in the DuckDB twin."""
    x = F.replace(p, F.lit("."), F.lit("\\."))
    x = F.replace(x, F.lit("**"), F.lit("%%"))
    x = F.replace(x, F.lit("*"), F.lit("[^/]*"))
    x = F.replace(x, F.lit("%%"), F.lit(".*"))
    return F.concat(F.lit("^"), x, F.lit("$"))


def _ant_rx_sql(e: str) -> str:
    x = rf"replace({e}, '.', '\.')"
    x = f"replace({x}, '**', '%%')"
    x = f"replace({x}, '*', '[^/]*')"
    x = f"replace({x}, '%%', '.*')"
    return f"'^' || {x} || '$'"


def secures_api(mentions: DataFrame) -> DataFrame:
    """Endpoint → first matching security rule (J17 regex theta join).

    Rule precedence (first-match-wins, reference applies rules in config
    order — relationshipBuilder.ts:387-407): longer (more specific) pattern
    first, then lexicographic — fully deterministic. Output:
    (res_path, pattern, rule_rank).
    """
    rules = (
        mentions.filter(F.col("mtype") == "secpat")
        .select(F.col("norm").alias("pattern"))
        .distinct()
        .withColumn(
            "rule_rank",
            F.row_number().over(
                Window.orderBy(F.desc(F.length("pattern")), F.asc("pattern"))
            ),
        )
        .withColumn("rx", _ant_rx_col(F.col("pattern")))
    )
    endpoints = (
        mentions.filter(F.col("mtype") == "endpoint")
        .select(F.col("path").alias("res_path"))
        .distinct()
    )
    matched = endpoints.join(
        F.broadcast(rules), F.regexp_like(F.col("res_path"), F.col("rx"))
    )
    w = Window.partitionBy("res_path").orderBy(F.asc("rule_rank"))
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("res_path", "pattern", F.col("rule_rank").cast("int"))
    )


def secures_api_cte() -> str:
    return f"""secures AS (
  WITH rules AS (
    SELECT pattern, CAST(row_number() OVER (ORDER BY len(pattern) DESC, pattern ASC) AS INT) AS rule_rank,
           {_ant_rx_sql('pattern')} AS rx
    FROM (SELECT DISTINCT norm AS pattern FROM mentions WHERE mtype = 'secpat')
  ), endpoints AS (
    SELECT DISTINCT path AS res_path FROM mentions WHERE mtype = 'endpoint'
  ), matched AS (
    SELECT e.res_path, r.pattern, r.rule_rank,
           row_number() OVER (PARTITION BY e.res_path ORDER BY r.rule_rank ASC) AS rn
    FROM endpoints e JOIN rules r ON regexp_matches(e.res_path, r.rx)
  )
  SELECT res_path, pattern, rule_rank FROM matched WHERE rn = 1
)"""


# --------------------------------------------------------------------------
# J9/J10 — nested-lineage explode + chained joins
# --------------------------------------------------------------------------
def lineage_triples(mentions: DataFrame) -> DataFrame:
    """Explode derive directives into lineage triples, resolving both
    endpoints against the entity registry (chained joins — unresolved names
    drop, exactly like the reference skips lineage to unknown symbols).

    Emits per (subj, pred, obj, arg_idx):
      transforms    turn → target entity        (arg_idx NULL)
      derives-from  target entity → source      (1-based source position)
      passes-to     source entity → target      (1-based source position)
    aggregated with an occurrence count ``n``.
    """
    registry = (
        mentions.filter(F.col("mtype") == "entity").select("norm").distinct()
    )
    derives = mentions.filter(F.col("mtype") == "derive").select(
        "conv_id",
        "turn_idx",
        F.col("norm").alias("target"),
        # nested array<struct<src,arg_idx>> — the reference's
        # derives{target, sources[]} shape — then exploded
        F.posexplode(F.split(F.col("extra"), ",")).alias("pos", "src"),
    )
    resolved = (
        derives.join(
            F.broadcast(registry.withColumnRenamed("norm", "target")), "target"
        )
        .join(F.broadcast(registry.withColumnRenamed("norm", "src")), "src")
        .select(
            "conv_id",
            "turn_idx",
            "target",
            "src",
            (F.col("pos") + 1).cast("int").alias("arg_idx"),
        )
    )
    target_id = node_id_col("entity", F.col("target"))
    src_id = node_id_col("entity", F.col("src"))
    turn_id = turn_id_col(F.col("conv_id"), F.col("turn_idx"))
    transforms = resolved.select(
        turn_id.alias("subj"),
        F.lit("transforms").alias("pred"),
        target_id.alias("obj"),
        F.lit(None).cast("int").alias("arg_idx"),
    )
    derives_from = resolved.select(
        target_id.alias("subj"),
        F.lit("derives-from").alias("pred"),
        src_id.alias("obj"),
        "arg_idx",
    )
    passes_to = resolved.select(
        src_id.alias("subj"),
        F.lit("passes-to").alias("pred"),
        target_id.alias("obj"),
        "arg_idx",
    )
    return (
        transforms.unionByName(derives_from)
        .unionByName(passes_to)
        .groupBy("subj", "pred", "obj", "arg_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def lineage_triples_cte() -> str:
    return f"""lineage AS (
  WITH registry AS (
    SELECT DISTINCT norm FROM mentions WHERE mtype = 'entity'
  ), exploded AS (
    SELECT conv_id, turn_idx, norm AS target, srcs[i] AS src, CAST(i AS INT) AS arg_idx
    FROM (
      SELECT conv_id, turn_idx, norm, srcs, unnest(range(1, len(srcs)+1)) AS i
      FROM (SELECT conv_id, turn_idx, norm, string_split(extra, ',') AS srcs
            FROM mentions WHERE mtype = 'derive')
    )
  ), resolved AS (
    SELECT e.* FROM exploded e
    JOIN registry rt ON e.target = rt.norm
    JOIN registry rs ON e.src = rs.norm
  ), triples AS (
    SELECT {turn_id_sql('conv_id', 'turn_idx')} AS subj, 'transforms' AS pred,
           {node_id_sql('entity', 'target')} AS obj, CAST(NULL AS INT) AS arg_idx
    FROM resolved
    UNION ALL
    SELECT {node_id_sql('entity', 'target')}, 'derives-from',
           {node_id_sql('entity', 'src')}, arg_idx
    FROM resolved
    UNION ALL
    SELECT {node_id_sql('entity', 'src')}, 'passes-to',
           {node_id_sql('entity', 'target')}, arg_idx
    FROM resolved
  )
  SELECT subj, pred, obj, arg_idx, CAST(COUNT(*) AS BIGINT) AS n
  FROM triples GROUP BY subj, pred, obj, arg_idx
)"""
