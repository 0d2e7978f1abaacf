#!/usr/bin/env python
"""Cross-scale oracle sweep runner with a per-oracle time budget.

Replays the driver's rows+schema+values comparison for every ``queries()``
entry at an arbitrary sf-dir (e.g. the 10x dir from jobs/make_scale.py).
Unlike the plain pytest replay, each DuckDB oracle runs under a watchdog
(``connection.interrupt()`` after ``--oracle-budget`` seconds): at 10x the
near-duplicate replica corpus makes the quadratic dedup-family oracles
(candidate self-joins over 10x-denser buckets) intractable in DuckDB even
though the ENGINE side finishes — a timed-out oracle is recorded as
``oracle_timeout`` (with the engine's row count and wall time, which still
smoke-tests the engine at scale) instead of wedging the whole sweep.
Queries whose oracle times out here should be re-swept at a smaller factor
(the sample-gate VERDICT r4 #5 anticipated) and the cap logged.

Usage:
    python jobs/make_scale.py --out /root/repo/.tmpdata/sf1.0 --factor 10
    python jobs/scale_sweep.py --sf-dir /root/repo/.tmpdata/sf1.0 \
        --out /tmp/sweep_sf1.json [--only dd2,dd3] [--oracle-budget 180]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def compare(sp_df, du_df) -> dict:
    import pandas as pd

    res = {
        "rows_match": len(sp_df) == len(du_df),
        "schema_match": sorted(sp_df.columns) == sorted(du_df.columns),
        "hash_match": False,
        "spark_rows": len(sp_df),
        "oracle_rows": len(du_df),
    }
    if res["rows_match"] and res["schema_match"]:
        cols = sorted(sp_df.columns)
        a = sp_df[cols].sort_values(cols).reset_index(drop=True)
        b = du_df[cols].sort_values(cols).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            res["hash_match"] = True
        except AssertionError:
            res["hash_match"] = False
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--oracle-budget", type=int, default=180)
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name prefixes to run")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--naive-oracles", action="store_true",
                    help="keep the deliberately-naive O(N^2) oracle twins "
                         "instead of the scaled overrides (the small-sf "
                         "losslessness-proof mode)")
    a = ap.parse_args()

    import duckdb

    import __spark_entry__ as E
    from glasseenterprise_mcp_spark.session import get_spark

    spark = get_spark(app_name="scale-sweep", master=f"local[{a.cores}]",
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{a.sf_dir}/{t}.parquet'")
        return c

    con = fresh_con()
    stuck: threading.Thread | None = None  # timed-out oracle still running on `con`
    # (thread, connection) pairs abandoned after a timeout whose thread
    # survived interrupt(): closed best-effort at sweep end so consecutive
    # stuck oracles don't accumulate live parquet-scanning connections.
    abandoned: list[tuple[threading.Thread, object]] = []

    qs, oracles = E.queries(), E.oracle_sql()
    if not a.naive_oracles:
        # scale-path twins (same result sets, non-quadratic shapes) for the
        # oracles whose naive formulations cannot finish at 10x — see
        # __spark_entry__.oracle_sql_scaled
        oracles = {**oracles, **E.oracle_sql_scaled()}
    names = sorted(qs)
    if a.only:
        pfx = tuple(a.only.split(","))
        names = [n for n in names if n.startswith(pfx)]
    # PRE-DECLARED outlier-rerun rule (r6): this host shows intermittent
    # vCPU-contention bursts in which futex-heavy shuffle phases collapse
    # (observed: dd5 297s in a burst vs 12-21s calm, SAME code and data, the
    # slowdown reproducible only while the burst lasts). A single-shot
    # engine reading taken inside a burst measures the host, not the plan —
    # so any query whose first engine reading is >= RERUN_ENGINE_SEC is
    # re-run (up to RERUN_MAX times), each reading bracketed by the shared
    # bench-canary (fixed-size md5-groupBy job, bench.py:_canary); the
    # recorded engine_sec is the reading with the CALMEST bracket (lowest
    # max-canary), and every reading + its bracket is kept in the row
    # (engine_runs / canary_runs) so the artifact shows the raw evidence.
    # Reruns share session-warm memoized upstreams; queries that pay a
    # cross-query memo build on first touch can therefore read faster on
    # rerun for warmth reasons too — the brackets make the two causes
    # distinguishable in the artifact.
    from bench import _canary

    RERUN_ENGINE_SEC, RERUN_MAX = 30.0, 2
    canary_base = min(_canary(spark, a.cores), _canary(spark, a.cores))

    results: dict = {}
    for name in names:
        row: dict = {}
        runs: list = []        # (engine_sec, canary_pre, canary_post)
        c_pre = canary_base
        while True:
            t0 = time.time()
            try:
                sp_df = qs[name](spark, a.sf_dir).toPandas()
                eng = round(time.time() - t0, 1)
            except Exception as exc:  # engine failure IS a sweep finding
                if runs:  # a RERUN died: keep the already-good first reading
                    row["engine_sec"] = runs[0][0]
                    row["engine_runs"] = [r[0] for r in runs]
                    row["rerun_err"] = str(exc)[:200]
                    break
                results[name] = {"err": f"engine: {exc}"[:300],
                                 "engine_sec": round(time.time() - t0, 1)}
                print(name, "ENGINE-ERR", results[name]["err"][:120],
                      flush=True)
                sp_df = None
                break
            if eng < RERUN_ENGINE_SEC:
                row["engine_sec"] = eng
                break
            c_post = round(_canary(spark, a.cores), 2)
            runs.append((eng, round(c_pre, 2), c_post))
            if len(runs) <= RERUN_MAX and (
                len(runs) == 1 or c_post > 1.25 * canary_base
            ):
                c_pre = c_post
                continue
            best = min(runs, key=lambda r: (max(r[1], r[2]), r[0]))
            row["engine_sec"] = best[0]
            row["engine_runs"] = [r[0] for r in runs]
            row["canary_runs"] = [[r[1], r[2]] for r in runs]
            row["canary_base"] = round(canary_base, 2)
            break
        if sp_df is None:
            continue
        if name not in oracles:
            row.update({"rows_only": True, "spark_rows": len(sp_df)})
            results[name] = row
            print(name, "rows-only", len(sp_df), flush=True)
            continue
        # a previously timed-out oracle may STILL be executing on this
        # connection even after interrupt() (DuckDB connections don't
        # support concurrent queries) — abandon the poisoned connection
        # and open a fresh one before the next oracle starts
        if stuck is not None:
            if stuck.is_alive():
                abandoned.append((stuck, con))
                con = fresh_con()
            else:  # thread died after we moved on — reopen for a clean slate
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_con()
        stuck = None
        holder: dict = {}

        def run_oracle(c=con):
            try:
                holder["df"] = c.sql(oracles[name]).df()
            except Exception as exc:  # includes InterruptException
                holder["err"] = str(exc)[:300]

        t1 = time.time()
        th = threading.Thread(target=run_oracle, daemon=True)
        th.start()
        th.join(a.oracle_budget)
        if th.is_alive():
            con.interrupt()
            th.join(30)
            if th.is_alive():
                stuck = th
            row.update({"oracle_timeout": True,
                        "oracle_budget_sec": a.oracle_budget,
                        "spark_rows": len(sp_df)})
            results[name] = row
            print(name, "ORACLE-TIMEOUT", f"engine={row['engine_sec']}s",
                  f"rows={len(sp_df)}", flush=True)
            continue
        row["oracle_sec"] = round(time.time() - t1, 1)
        if "err" in holder:
            row["err"] = f"oracle: {holder['err']}"
        else:
            row.update(compare(sp_df, holder["df"]))
        results[name] = row
        ok = row.get("hash_match")
        print(name, "OK" if ok else f"FAIL {row}", f"({row['engine_sec']}s/"
              f"{row.get('oracle_sec', '?')}s)", flush=True)
    Path(a.out).write_text(json.dumps(results, indent=1))
    n_ok = sum(1 for r in results.values() if r.get("hash_match"))
    n_to = sum(1 for r in results.values() if r.get("oracle_timeout"))
    n_ro = sum(1 for r in results.values() if r.get("rows_only"))
    n_bad = len(results) - n_ok - n_to - n_ro
    print(json.dumps({"total": len(results), "hash_ok": n_ok,
                      "oracle_timeout": n_to, "rows_only": n_ro,
                      "bad": n_bad}))
    # bound resource growth: re-interrupt every abandoned connection (incl.
    # a trailing `stuck` from the LAST query) and close the ones whose
    # threads have since died; daemon threads die with the process anyway.
    if stuck is not None and stuck.is_alive():
        abandoned.append((stuck, con))
    for th, c in abandoned:
        try:
            c.interrupt()
        except Exception:
            pass
        th.join(10)
        if not th.is_alive():
            try:
                c.close()
            except Exception:
                pass
    spark.stop()


if __name__ == "__main__":
    main()
