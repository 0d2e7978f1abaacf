"""Incremental/streaming mode: two micro-batches (split by conversation)
through the Structured Streaming path with a shared checkpoint must converge
to the same graph as a one-shot batch run — the resume-from-checkpoint
equals one-shot invariant (SURVEY.md §5.4; idempotent MERGE contract
analogue of saveNodes.ts:137-158)."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from glasseenterprise_mcp_spark.operators.materialize import GraphSink
from glasseenterprise_mcp_spark.pipeline import run_pipeline
from glasseenterprise_mcp_spark.sources.transcripts import derive_transcripts
from glasseenterprise_mcp_spark.streaming.incremental import run_stream

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def split_batches(spark):
    t = derive_transcripts(spark, SF_SMALL).drop("ts_epoch")
    conv_num = F.substring("conv_id", 2, 10).cast("int")
    a = t.filter(conv_num % 2 == 0)
    b = t.filter(conv_num % 2 == 1)
    return t, a, b


def _triples(df):
    return {(r.subj, r.pred, r.obj) for r in df.select("subj", "pred", "obj").collect()}


def test_two_batch_stream_equals_one_shot(spark, split_batches):
    t, a, b = split_batches
    src = tempfile.mkdtemp()
    ckpt = tempfile.mkdtemp()
    sink_dir = tempfile.mkdtemp()
    sink = GraphSink(spark, sink_dir)

    # batch 1 arrives; drain
    a.write.mode("append").parquet(src)
    q = run_stream(spark, src, sink, ckpt, "snapS", available_now=True)
    q.awaitTermination(300)

    # batch 2 arrives later; resume from the same checkpoint — only the new
    # file is processed
    b.write.mode("append").parquet(src)
    q = run_stream(spark, src, sink, ckpt, "snapS", available_now=True)
    q.awaitTermination(300)

    got = _triples(sink.read("edges"))

    one_shot = run_pipeline(spark, t, sink=None, snapshot_version="snap1",
                            with_components=False)
    want = _triples(one_shot.edges)
    one_shot.mentions.unpersist()

    assert got == want, (
        f"incremental != one-shot: missing={len(want - got)} extra={len(got - want)}"
    )

    # node id/type parity too (names may legitimately differ per-batch mode)
    got_nodes = {
        (r.id, r.type) for r in sink.read("nodes").select("id", "type").collect()
    }
    want_nodes = {
        (r.id, r.type) for r in one_shot.nodes.select("id", "type").collect()
    }
    assert got_nodes == want_nodes


def test_replay_is_idempotent(spark, split_batches):
    """Re-processing the same delta (simulated retry) must not change the
    graph — the stable-id MERGE contract."""
    from glasseenterprise_mcp_spark.streaming.incremental import incremental_update

    _, a, _b = split_batches
    sink_dir = tempfile.mkdtemp()
    sink = GraphSink(spark, sink_dir)
    incremental_update(spark, sink, a, "snapA")
    n1 = sink.read("edges").count(), sink.read("nodes").count()
    incremental_update(spark, sink, a, "snapA")
    n2 = sink.read("edges").count(), sink.read("nodes").count()
    assert n1 == n2
