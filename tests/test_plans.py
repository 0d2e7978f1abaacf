"""Physical-plan audits: the plans must be the ones we'd want at 100TB —
filters pushed to the parquet scan, column pruning active, small dims
broadcast, no cartesian products in the linking path."""

from __future__ import annotations

import pyspark.sql.functions as F

from glasseenterprise_mcp_spark.operators.analytics import disjunctive_match
from glasseenterprise_mcp_spark.operators.extract import extract_mentions
from glasseenterprise_mcp_spark.operators.link import refers_to_edges
from glasseenterprise_mcp_spark.sources.transcripts import derive_transcripts

from .conftest import SF_SMALL


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_pruning(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[1][:200]
    # column pruning: text (the fat column) must not be read
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "text" not in read_schema


def test_refers_to_broadcasts_provided_side(spark):
    # distributed path (driver_threshold=0): provided side must broadcast
    t = derive_transcripts(spark, SF_SMALL)
    m = extract_mentions(t)
    plan = _plan(refers_to_edges(m, driver_threshold=0))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_refers_to_paths_agree(spark):
    # the registry-sized driver short-circuit must emit EXACTLY the rows of
    # the distributed broadcast cascade
    t = derive_transcripts(spark, SF_SMALL)
    m = extract_mentions(t).cache()
    a = {tuple(r) for r in refers_to_edges(m, driver_threshold=0).collect()}
    b = {tuple(r) for r in refers_to_edges(m).collect()}
    m.unpersist()
    assert a == b and len(a) > 0


def test_used_by_filter_below_join(spark):
    """J18: the contains predicate must prune the probe side BEFORE the
    join (a Filter with Contains under the join input), and the join must
    be a real equi join — no cartesian."""
    from glasseenterprise_mcp_spark.operators.link import used_by_edges

    t = derive_transcripts(spark, SF_SMALL)
    m = extract_mentions(t)
    plan = _plan(used_by_edges(m))
    assert "CartesianProduct" not in plan
    assert "Contains" in plan  # pushed into a probe-side Filter
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan  # equi join


def test_anchored_contains_tier(spark):
    """anchored_contains=True: the tier-2 match must end at a segment
    boundary — /api/v1/r12 matches the /r1 resource only in default
    (reference-faithful) mode; /api/v1/r1?q=1 matches in both. The flag
    behaves identically on the distributed and driver-side paths."""
    rows = [
        # consumed urls: (mtype, surface, norm, path, method)
        ("url", "http://s/api/v1/r12", "/api/v1/r12", "/api/v1/r12", None),
        ("url", "http://s/api/v1/r1?q=1", "/api/v1/r1", "/api/v1/r1", None),
        # provided endpoint /r1 (no exact/variant match for either url)
        ("endpoint", "/r1", "/r1", "/r1", "GET"),
        # metachar-bearing provider: '.' in the norm must be escaped on the
        # DISTRIBUTED path too (Java Matcher replacement "\\\\$1"; a bare
        # "\\$1" emitted the literal "$1" and tier-2 silently matched
        # nothing — r3 ADVICE). /b.x/r9 must match /api/b.x/r9/z but NOT
        # the '.'-as-wildcard decoy /api/bQx/r9/z.
        ("url", "http://s/api/b.x/r9/z", "/api/b.x/r9/z", "/api/b.x/r9/z", None),
        ("url", "http://s/api/bQx/r9/z", "/api/bQx/r9/z", "/api/bQx/r9/z", None),
        ("endpoint", "/b.x/r9", "/b.x/r9", "/b.x/r9", "GET"),
    ]
    m = spark.createDataFrame(
        [("c0", i, *r) for i, r in enumerate(rows)],
        "conv_id string, turn_idx int, mtype string, surface string, "
        "norm string, path string, method string",
    )
    for thr in (0, 5000):  # distributed / driver-side
        loose = {
            r.tier for r in refers_to_edges(m, driver_threshold=thr).collect()
        }
        anchored_rows = refers_to_edges(
            m, driver_threshold=thr, anchored_contains=True
        ).collect()
        anchored_subjs = {r.subj for r in anchored_rows}
        default = refers_to_edges(m, driver_threshold=thr).count()
        # loose contains: r12+r1 match /r1, b.x (exact substring) AND the
        # bQx decoy (substring test is literal, '.' is not a wildcard)
        assert default == 3 and loose == {"2"}, (thr, default, loose)
        # anchored: r1?q=1 matches /r1 at a boundary, b.x matches /b.x/r9
        # at a boundary; r12 (no boundary) and bQx (escaped '.') must not
        assert len(anchored_rows) == 2, (thr, anchored_rows)
        assert len(anchored_subjs) == 2, (thr, anchored_subjs)


def test_whole_stage_codegen_relational(spark):
    """Pure relational stages (no Python boundary) must be codegen'd; the
    aggregate must be hash-based, not sort-based."""
    from glasseenterprise_mcp_spark.operators.analytics import sessionize_events

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    plan = _plan(sessionize_events(ev))
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_calls_tool_uses_hash_aggregate(spark):
    from glasseenterprise_mcp_spark.operators.link import calls_tool_edges

    t = derive_transcripts(spark, SF_SMALL)
    m = extract_mentions(t)
    plan = _plan(calls_tool_edges(t, m))
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_bucketed_join_is_shuffle_free(spark):
    """100TB co-location story: node and edge tables bucketed on the join
    key at write time join WITHOUT a shuffle on either side (no Exchange in
    the plan once broadcast is disabled) — the persisted-graph layout that
    makes repeated graph queries exchange-free at corpus scale."""
    from glasseenterprise_mcp_spark.operators.extract import extract_mentions
    from glasseenterprise_mcp_spark.operators.link import mentions_in_edges
    from glasseenterprise_mcp_spark.operators.materialize import build_nodes
    from glasseenterprise_mcp_spark.sources.transcripts import derive_transcripts

    t = derive_transcripts(spark, SF_SMALL)
    m = extract_mentions(t)
    nodes = build_nodes(t, m, "s").withColumn("id", F.hex(F.col("id")))
    edges = mentions_in_edges(m).withColumn("subj", F.hex(F.col("subj")))

    spark.sql("DROP TABLE IF EXISTS bkt_nodes")
    spark.sql("DROP TABLE IF EXISTS bkt_edges")
    nodes.write.bucketBy(8, "id").sortBy("id").saveAsTable("bkt_nodes")
    edges.write.bucketBy(8, "subj").sortBy("subj").saveAsTable("bkt_edges")

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_edges").join(
            spark.table("bkt_nodes").select(F.col("id").alias("subj"), "type"),
            "subj",
        )
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS bkt_nodes")
        spark.sql("DROP TABLE IF EXISTS bkt_edges")


def test_disjunctive_match_no_cross_join(spark):
    left = spark.createDataFrame(
        [("l1", "a@x", "alice", "A"), ("l2", "b@y", "bob", "B"), ("l3", "c@z", "carol", "C")],
        ["lid", "email", "name", "alias"],
    )
    right = spark.createDataFrame(
        [("r1", "a@x", "zz", "zz"), ("r2", "zz", "bob", "zz"), ("r3", "zz", "zz", "C")],
        ["rid", "r_email", "r_name", "r_alias"],
    )
    out = disjunctive_match(
        left, right, [("email", "r_email"), ("name", "r_name"), ("alias", "r_alias")]
    )
    got = {(r.lid, r.rid, r.via) for r in out.collect()}
    assert got == {("l1", "r1", 1), ("l2", "r2", 2), ("l3", "r3", 3)}
    assert "CartesianProduct" not in _plan(out)


def test_disjunctive_match_precedence(spark):
    # a left row matching two disjuncts takes the earliest (via=1)
    left = spark.createDataFrame([("l1", "k", "k")], ["lid", "email", "name"])
    right = spark.createDataFrame(
        [("r1", "k", "zz"), ("r2", "zz", "k")], ["rid", "r_email", "r_name"]
    )
    out = disjunctive_match(left, right, [("email", "r_email"), ("name", "r_name")])
    assert [(r.lid, r.rid, r.via) for r in out.collect()] == [("l1", "r1", 1)]


def test_contamination_broadcasts_eval_side(spark):
    """dd6: a small eval side AUTO-broadcasts under the engine threshold
    (no forced hint — an oversized eval side must degrade to a shuffle
    join, not a driver OOM) and the shingle join is a real equi join —
    no cartesian product."""
    from glasseenterprise_mcp_spark.operators.dedup import (
        contamination_pairs,
        shingles,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(contamination_pairs(shingles(docs)))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_window_carry_not_range_join(spark):
    """ev3: the as-of join must compile to the union-and-carry shape — a
    Window over ONE hash exchange on user_id, with NO join operator in the
    plan at all (a range-join formulation would multiply every click by
    all its preceding views — quadratic per hot user)."""
    from glasseenterprise_mcp_spark.operators.analytics import asof_join_events

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    plan = _plan(asof_join_events(ev))
    assert "Window" in plan
    for join_op in (
        "SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
        "BroadcastNestedLoopJoin", "ShuffledHashJoin",
    ):
        assert join_op not in plan, join_op


def test_duplicate_spans_plan_shape(spark):
    """dd8: the span-merge stage must run BOTH window functions (running
    max-end, island sum) over ONE doc_id exchange, the final (doc_id, g)
    aggregate must reuse that partitioning (no further exchange after the
    windows), every Window must carry a partition spec (no global sort),
    and the dup-hash set must join back as a broadcast while small."""
    from glasseenterprise_mcp_spark.operators.dedup import (
        duplicate_spans,
        positional_windows,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(duplicate_spans(positional_windows(docs)))
    assert plan.count("Window") >= 2
    assert "windowspecdefinition(doc_id" in plan
    # no partition-spec-free window anywhere
    assert "windowspecdefinition(," not in plan.replace(" ", "")
    # exactly two data exchanges: the dup-hash partial aggregate and the
    # doc_id repartition for the merge windows (broadcast exchanges are
    # not hashpartitioning)
    assert plan.count("hashpartitioning") == 2, plan.count("hashpartitioning")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_charlm_model_branch_reuses_exchange(spark):
    """tx8: the model branch (corpus bigram counts) and the probe branch
    (per-doc bigram counts) are the SAME (doc_id, bg) aggregate — AQE must
    dedupe them into one ReusedExchange at runtime so the corpus-char-
    scale explode + partial agg is paid once, and the model side must
    arrive at the join as a broadcast."""
    from glasseenterprise_mcp_spark.operators.textstats import charlm_quality

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    q = charlm_quality(docs)
    q.collect()  # AQE finalizes reuse only at execution
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_loop_plan_shape(spark):
    """g6: after the upfront edge checkpoint, ONE round of the rank loop
    must contain no cartesian product (the dangling scalar rides as a
    broadcast nested-loop over a 1-row frame — bounded by construction)
    and no partition-spec-free window; the contribution aggregate is the
    only corpus-scale hash exchange besides the state join."""
    from glasseenterprise_mcp_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "subj string, obj string",
    )
    r = pagerank(edges, iters=1)
    plan = _plan(r)
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition" not in plan


def test_bloom_prefilter_sits_below_the_shuffle(spark):
    """bf1's whole point is WHERE the discard happens: the bloom bit-test
    filter must execute in the scan stage, below the semi join's exchange,
    so non-matching rows never ship. The formatted plan lists operators
    leaf-first: the xxhash64 Filter must appear before (deeper than) any
    Exchange/BroadcastExchange of the probe side."""
    from glasseenterprise_mcp_spark.functions.bloom import bloom_semi_join

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    keys = ev.filter(F.col("event_type") == "signup").select("user_id")
    result, pruned = bloom_semi_join(ev, keys, "user_id")
    plan = _plan(result)
    assert "xxhash64" in plan
    # the pruned side is a pure narrow filter over the scan — no exchange
    assert "Exchange" not in _plan(pruned)


def test_zorder_key_is_exchange_free(spark):
    """zo1's key computation must be narrow: one 1-row aggregate broadcast
    for the extremes (BroadcastExchange/BroadcastNestedLoopJoin of a 1-row
    dim is the accepted pattern), and NO hash/range exchange of the events
    themselves until write_zordered's deliberate range sort."""
    from glasseenterprise_mcp_spark.operators.layout import zorder_key

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    plan = _plan(zorder_key(ev))
    import re

    # hash/range exchanges of the fact side would mean the key computation
    # itself shuffles; only the 1-row extremes may exchange (broadcast)
    fact_exchanges = [
        l for l in plan.splitlines()
        if re.search(r"Exchange (hashpartitioning|rangepartitioning)", l)
    ]
    assert fact_exchanges == [], fact_exchanges


def test_ann_query_side_shuffles_above_budget(spark):
    """r6 verdict #1: above the broadcast budget the ANN query side must
    SHUFFLE-join (no BroadcastExchange of a corpus-proportional frame);
    below it the broadcast fast path stays. And the two physical paths must
    return identical rows (the hash-gate property, checked directly)."""
    from glasseenterprise_mcp_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        pq_topk,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qf = F.expr("vec_id % 50 = 0")

    # Above the budget no HINT forces a broadcast — Spark's own size
    # estimate decides (adaptive, scale-safe: a corpus-proportional query
    # side blows past autoBroadcastJoinThreshold and shuffles). Assert by
    # disabling the auto threshold: any BroadcastExchange left in the plan
    # would have to come from a hint.
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert "BroadcastExchange" not in _plan(
            lsh_topk(emb, qf, broadcast_limit=0)
        )
        # ivf: the constant-size centroid broadcasts are hint-forced by
        # design and stay; the query/probe side must not force one
        shuf = _plan(ivf_topk(emb, qf, broadcast_limit=0))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    fast = _plan(ivf_topk(emb, qf))
    assert shuf.count("BroadcastExchange") < fast.count("BroadcastExchange")
    # fast path preserved: the query side still broadcasts under the budget
    assert "BroadcastExchange" in _plan(lsh_topk(emb, qf))

    # results identical through both physical paths, all four operators
    for op in (brute_force_topk, lsh_topk, ivf_topk, pq_topk):
        a = sorted(map(tuple, op(emb, qf).collect()))
        b = sorted(map(tuple, op(emb, qf, broadcast_limit=0).collect()))
        assert a == b, op.__name__
