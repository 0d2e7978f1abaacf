"""Stage-level scaling profile: run ONE pinned leg (like bench_leg) but time
the pipeline's phases separately so the non-scaling component is visible.

Usage: taskset -c 0-(N-1) python jobs/profile_leg.py --cores N --factor F

Phases timed (all after a factor-1 warmup):
  t_extract   mentions materialized via a count over the extraction output
  t_pipeline  full run_pipeline + edges.count() (the bench-leg measurement)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--factor", type=int, default=600)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--shuffle", type=int, default=None)
    args = ap.parse_args()

    from glasseenterprise_mcp_spark.operators.extract import extract_mentions
    from glasseenterprise_mcp_spark.pipeline import run_pipeline
    from glasseenterprise_mcp_spark.session import get_spark
    from glasseenterprise_mcp_spark.sources.transcripts import amplify, derive_transcripts

    spark = get_spark(
        app_name=f"profile-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.shuffle or args.cores * 2,
        extra_confs={
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={args.cores}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (python worker pool + JIT)
    w = run_pipeline(spark, derive_transcripts(spark, args.sf_dir), sink=None,
                     snapshot_version="warm", with_components=False)
    w.edges.count()
    w.mentions.unpersist()

    t = amplify(derive_transcripts(spark, args.sf_dir), args.factor)

    # phase decomposition mirroring run_pipeline's internal order
    from glasseenterprise_mcp_spark.operators.canonicalize import connected_components
    from glasseenterprise_mcp_spark.operators.link import (
        calls_tool_edges, mentions_in_edges, refers_to_edges, replies_to_edges,
    )
    from glasseenterprise_mcp_spark.operators.materialize import build_edges

    t = t.cache()
    t0 = time.time()
    mentions = extract_mentions(t).cache()
    e_refers = refers_to_edges(mentions)
    e_refers = e_refers.localCheckpoint(eager=True)
    t_refers = time.time() - t0  # extraction + mentions cache + registries + match

    t0 = time.time()
    comps = connected_components(e_refers.select("subj", "obj"), "subj", "obj")
    t_cc = time.time() - t0

    t0 = time.time()
    edges = build_edges(
        [mentions_in_edges(mentions).drop("subj_kind"),
         replies_to_edges(t, mentions),
         calls_tool_edges(t, mentions),
         e_refers], "prof").cache()
    triples = edges.count()
    t_edges = time.time() - t0

    print(json.dumps({
        "cores": args.cores, "factor": args.factor,
        "t_extract_refers": round(t_refers, 2), "t_cc": round(t_cc, 2),
        "t_edges": round(t_edges, 2), "triples": triples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
