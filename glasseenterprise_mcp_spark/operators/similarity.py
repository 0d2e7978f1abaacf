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


def embedding_near_dup_pairs(
    embeddings: DataFrame, min_cos_pct: int = 35, bits: int = LSH_BITS
) -> DataFrame:
    """Embedding-cosine near-duplicate candidate pairs (the dedup-family
    member over vectors): LSH-bucketed self-join → integer cosine test.

    Exactness trick: with qv = round(x*1000) and d2 = floor(dot/1000),
    cos(a,b) ≥ t  ⇔  d2 > 0 ∧ d2²·10⁴ ≥ t_pct²·(naa/1000)·(nbb/1000)
    (na a = self-dot) — all int64 arithmetic, no sqrt, no floats, identical
    in Spark and DuckDB, overflow-safe for |x| ≤ ~30 at 64 dims.

    Output: (a, b, cos_pct_floor) with a < b; cos_pct_floor is the integer
    floor of 100·cos for reporting."""
    q = quantized(embeddings).withColumn("bucket", lsh_bucket_col("qv", bits))
    q = q.withColumn("self_dot", _dot("qv", "qv"))
    l = q.select(
        "bucket", F.col("vec_id").alias("a"), F.col("qv").alias("qa"),
        F.col("self_dot").alias("naa"),
    )
    r = q.select(
        "bucket", F.col("vec_id").alias("b"), F.col("qv").alias("qb"),
        F.col("self_dot").alias("nbb"),
    )
    pairs = l.join(r, "bucket").filter(F.col("a") < F.col("b"))
    d2 = F.floor(_dot("qa", "qb") / 1000).cast("long")
    na2 = F.floor(F.col("naa") / 1000).cast("long")
    nb2 = F.floor(F.col("nbb") / 1000).cast("long")
    scored = pairs.select(
        "a", "b", d2.alias("d2"), na2.alias("na2"), nb2.alias("nb2")
    ).filter(
        (F.col("d2") > 0)
        & (F.col("d2") * F.col("d2") * 10000
           >= F.lit(min_cos_pct * min_cos_pct) * F.col("na2") * F.col("nb2"))
    )
    cos_pct = F.floor(
        F.col("d2") * 100 / F.sqrt((F.col("na2") * F.col("nb2")).cast("double"))
    ).cast("int")
    return scored.select("a", "b", cos_pct.alias("cos_pct_floor"))


def embedding_near_dup_pairs_sql(min_cos_pct: int = 35, bits: int = LSH_BITS) -> str:
    bucket_parts = []
    for b in range(bits):
        weights = ", ".join(str(_hyperplane_weight(b, d)) for d in range(DIM))
        bucket_parts.append(
            f"(CASE WHEN CAST(list_dot_product(qv, [{weights}]) AS BIGINT) >= 0"
            " THEN '1' ELSE '0' END)"
        )
    bucket = " || ".join(bucket_parts)
    t2 = min_cos_pct * min_cos_pct
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
  FROM embeddings
), qb AS (
  SELECT vec_id, qv, {bucket} AS bucket,
         CAST(list_dot_product(qv, qv) AS BIGINT) AS self_dot
  FROM q
), scored AS (
  SELECT l.vec_id AS a, r.vec_id AS b,
         CAST(floor(CAST(list_dot_product(l.qv, r.qv) AS BIGINT) / 1000) AS BIGINT) AS d2,
         CAST(floor(l.self_dot / 1000) AS BIGINT) AS na2,
         CAST(floor(r.self_dot / 1000) AS BIGINT) AS nb2
  FROM qb l JOIN qb r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
)
SELECT a, b,
       CAST(floor(d2 * 100 / sqrt(CAST(na2 * nb2 AS DOUBLE))) AS INT) AS cos_pct_floor
FROM scored
WHERE d2 > 0 AND d2 * d2 * 10000 >= {t2} * na2 * nb2"""


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
