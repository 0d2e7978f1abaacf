"""One scaling-study leg, run as a FRESH process per parallelism level.

Why a subprocess per leg: the north rule's criterion is throughput scaling
from an N-core cluster to a 4N-core cluster. In local mode the JVM is shared
across legs and sizes its constant-parallelism services — GC worker threads,
JIT compiler threads, netty/shuffle pools — to the HOST's 32 cores, not to
local[N]. That gives the small leg up to ~20 free helper threads the big leg
also gets, compressing the measured ratio far below what real N-core vs
4N-core machines would show. ``-XX:ActiveProcessorCount=N`` makes the JVM
size every internal pool to exactly N cores — the faithful emulation of an
N-core executor host — and a fresh process per leg is the only way to apply
it (JVM flags are fixed at launch).

Prints one JSON line:
{"triples": N, "sec": W, "master": ..., "factor": ...,
 "canary_pre": C0, "canary_post": C1}.

The canary bracket (r5 verdict #3): a fixed-size pure-JVM calibration job
(md5 groupBy over 4M rows, the same canary the query leg interleaves) runs
immediately before and after the measured section IN THE SAME PINNED
PROCESS, so each scaling leg carries its own host-steal evidence. The
caller's pre-declared exclusion rule (bench.py) drops steal-marked legs
from the primary efficiency estimator — the r5 artifact's 0.763 was one
557s leg in a 70s pool that both builder dry-runs contradicted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _materialize_triples(edges) -> int:
    """Fully materialize the triple table through Spark's ``noop`` sink —
    every column of every row is computed and streamed to a discarding
    writer (the distributed-sink stand-in: on a real cluster the triples go
    to Iceberg, whose write bandwidth scales with the executor count, while
    a single host's DRAM columnar cache does not). An ``observe`` rides the
    same pass for the row count, so the measured section is exactly one
    full materialization. A bare count() would instead let Catalyst prune
    the projection (under-measuring id minting), and cache()+count() would
    add a corpus-scale in-memory copy nothing reads."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    ob = Observation("triples")
    edges.observe(ob, F.count(F.lit(1)).alias("n")).write.format("noop").mode(
        "overwrite"
    ).save()
    return ob.get["n"]


def run_leg(
    cores: int,
    factor: int,
    sf_dir: str,
    warmup: bool = True,
    shuffle: int | None = None,
) -> dict:
    from glasseenterprise_mcp_spark.pipeline import run_pipeline
    from glasseenterprise_mcp_spark.session import get_spark
    from glasseenterprise_mcp_spark.sources.transcripts import (
        amplify,
        derive_transcripts,
    )

    master = f"local[{cores}]"
    spark = get_spark(
        app_name=f"bench-leg-{cores}",
        master=master,
        # IDENTICAL JOB on both legs: shuffle partitioning is a job config,
        # not a resource; callers pass the value sized for the big leg so
        # only the cluster size varies between legs.
        shuffle_partitions=shuffle if shuffle is not None else cores * 2,
        extra_confs={
            # emulate an N-core host: GC/JIT/IO pools sized to N (see module
            # docstring). Only effective because this process is fresh.
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cores}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if warmup:
        # spawn the Python worker pool + JIT before the measured run (on a
        # real cluster executors are long-lived; first-job fork cost is not
        # steady-state throughput)
        # same snapshot literal + component path as the measured run so the
        # warmup compiles the IDENTICAL generated code and plan shapes (a
        # different literal is a different codegen cache key — the measured
        # section would re-JIT the big union stage)
        w = run_pipeline(
            spark,
            derive_transcripts(spark, sf_dir),
            sink=None,
            snapshot_version="bench",
        )
        _materialize_triples(w.edges)
        w.mentions.unpersist()

    def _canary() -> float:
        import pyspark.sql.functions as F

        t0 = time.time()
        (
            spark.range(4_000_000)
            .repartition(cores)
            .select(F.md5(F.col("id").cast("string").cast("binary")).alias("h"))
            .groupBy(F.substring("h", 1, 2))
            .count()
            .count()
        )
        return round(time.time() - t0, 3)

    # the canary workload itself JITs on first execution (range source +
    # md5-on-string codegen — codepaths the pipeline warm-up doesn't touch):
    # the r6 side study read pre 1.5-2x post on 10/10 legs, which the 1.25x
    # marking rule then read as steal on EVERY leg. One untimed canary
    # first, so canary_pre measures the host, not the JIT.
    _canary()
    canary_pre = _canary()
    t = amplify(derive_transcripts(spark, sf_dir), factor)
    stat0 = _read_proc_stat()
    t0 = time.time()
    res = run_pipeline(spark, t, sink=None, snapshot_version="bench")
    triples = _materialize_triples(res.edges)
    wall = time.time() - t0
    host = _stat_delta(stat0, _read_proc_stat())
    canary_post = _canary()
    res.mentions.unpersist()
    spark.stop()
    return {
        "triples": triples,
        "sec": round(wall, 3),
        "master": master,
        "factor": factor,
        "canary_pre": canary_pre,
        "canary_post": canary_post,
        # guest-visible host evidence over the measured section: the r6
        # round hit a sustained hypervisor-throttle mode the canary barely
        # sees (uniform ~30-80% slowdown, sys/steal LOW) — these shares let
        # the artifact's reader distinguish "engine used fewer cores" from
        # "host delivered fewer cycles" (busy_cores ≈ (user+sys)/wall).
        "host": host,
    }


def _read_proc_stat() -> list[int] | None:
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except Exception:
        return None


def _stat_delta(a: list[int] | None, b: list[int] | None) -> dict | None:
    if a is None or b is None:
        return None
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    ncpu = os.cpu_count() or 1
    # guest-delivered busy cycles only: user+nice+system+irq+softirq.
    # (tot - idle - iowait would count steal/guest ticks as busy — i.e.
    # overstate delivered cycles precisely in the hypervisor-steal mode
    # this field diagnoses; r6 ADVICE.)
    busy = d[0] + d[1] + d[2] + (d[5] if len(d) > 5 else 0) + (
        d[6] if len(d) > 6 else 0
    )
    return {
        "user_pct": round(100 * (d[0] + d[1]) / tot, 1),
        "sys_pct": round(100 * d[2] / tot, 1),
        "idle_pct": round(100 * d[3] / tot, 1),
        "iowait_pct": round(100 * d[4] / tot, 1),
        "steal_pct": round(100 * d[7] / tot, 1) if len(d) > 7 else None,
        "busy_cores": round(ncpu * busy / tot, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--factor", type=int, required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()
    out = run_leg(args.cores, args.factor, args.sf_dir,
                  warmup=not args.no_warmup, shuffle=args.shuffle)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
