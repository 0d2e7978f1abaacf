"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label): brute-force top-k as the exactness baseline, an
LSH-bucketed variant as the scale path.

Determinism contract: embeddings are *quantized* (round(x*1000) as int64)
before any arithmetic, so dot products are exact integer sums — identical in
Spark, DuckDB (the oracle) and numpy, with no float-accumulation-order
divergence. Ranking ties break on neighbor id.

Scale notes: brute-force is a broadcast nested-loop of queries x corpus —
correct baseline, O(Q*N). The LSH variant buckets by random-hyperplane sign
signatures (deterministic integer pseudo-hyperplanes) so candidate
generation is an equi join on the bucket key; recall is tunable by
signature bits / probe multiplicity. At 100TB the corpus side stays
partitioned; only the (small) query set broadcasts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

DIM = 64
LSH_BITS = 4


def quantized(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, qv array<long>): round(x*1000)."""
    return embeddings.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))").alias("qv"),
    )


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def brute_force_topk(
    embeddings: DataFrame, query_filter: Column, k: int = 5
) -> DataFrame:
    """Exact top-k by integer dot product: (query_id, neighbor_id, rank, dot).
    Queries broadcast against the full corpus; rank ties break on
    neighbor_id asc (W1-style deterministic window)."""
    q = quantized(embeddings)
    queries = q.filter(query_filter).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    pairs = q.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _dot("q_qv", "qv").alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "dot")
    )


def brute_force_topk_sql(query_where: str, k: int = 5) -> str:
    return f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
  FROM embeddings
), queries AS (
  SELECT vec_id AS query_id, qv AS q_qv FROM q WHERE {query_where}
), scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q_qv, c.qv) AS BIGINT) AS dot
  FROM queries, q c WHERE c.vec_id <> query_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, dot
FROM ranked WHERE rank <= {k}"""


def _hyperplane_weight(bit: int, dim: int) -> int:
    """Deterministic pseudo-random hyperplane weight, identical in every
    dialect: Knuth multiplicative mix, centered."""
    return ((bit * 40503 + dim * 2654435761) % 1009) - 504


def lsh_bucket_col(qv: str = "qv", bits: int = LSH_BITS) -> Column:
    """Sign-concatenation bucket key from integer hyperplane projections."""
    parts = []
    for b in range(bits):
        weights = ", ".join(
            str(_hyperplane_weight(b, d)) for d in range(DIM)
        )
        proj = F.expr(
            f"aggregate(zip_with({qv}, array({weights}), (x, w) -> x * w),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        parts.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*parts)


def lsh_topk(embeddings: DataFrame, query_filter: Column, k: int = 5) -> DataFrame:
    """ANN via hyperplane-LSH bucketing: candidates share the bucket key
    (equi join instead of cross product), then exact integer rerank.
    Same output shape as brute force; recall < 1 by design."""
    q = quantized(embeddings).withColumn("bucket", lsh_bucket_col("qv"))
    queries = q.filter(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("bucket"),
    )
    cands = q.join(F.broadcast(queries), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _dot("q_qv", "qv").alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "dot")
    )


def lsh_topk_sql(query_where: str, k: int = 5, bits: int = LSH_BITS) -> str:
    bucket_parts = []
    for b in range(bits):
        weights = ", ".join(str(_hyperplane_weight(b, d)) for d in range(DIM))
        bucket_parts.append(
            f"(CASE WHEN CAST(list_dot_product(qv, [{weights}]) AS BIGINT) >= 0"
            " THEN '1' ELSE '0' END)"
        )
    bucket = " || ".join(bucket_parts)
    return f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
  FROM embeddings
), qb AS (
  SELECT *, {bucket} AS bucket FROM q
), queries AS (
  SELECT vec_id AS query_id, qv AS q_qv, bucket FROM qb WHERE {query_where}
), scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q_qv, c.qv) AS BIGINT) AS dot
  FROM queries JOIN qb c USING (bucket) WHERE c.vec_id <> query_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, dot
FROM ranked WHERE rank <= {k}"""
