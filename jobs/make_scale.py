#!/usr/bin/env python
"""Deterministic testdata amplifier for the cross-scale oracle sweep.

Generates an sf-dir ``factor``x the size of a source sf-dir: documents /
events / embeddings are replicated with remapped ids (replica r of doc d
gets ``d + r * N`` — ids stay dense, so the transcripts derivation's
conv/turn layout scales cleanly) and per-replica content variation
(`` rep<r>`` appended to text; event timestamps shifted by r days; event
users shifted into disjoint ranges). The small TPC-H-ish dims are copied
as-is. Pure DuckDB — no Spark session needed, runs in seconds.

Both the engine and the DuckDB oracle read the SAME generated parquet, so
the sweep checks cross-scale CORRECTNESS (partition layouts, overflow,
rounding, cardinality cliffs), not data realism. Replicated documents are
deliberately near-duplicates of each other (one-token difference) — the
dedup family gets a 10x-denser candidate graph, which is exactly the
stress the sweep wants.

Usage:
    python jobs/make_scale.py --src /root/testdata/sf0.1 \
        --out /root/repo/.tmpdata/sf1.0 --factor 10
    SPARK_GRAFT_TEST_SF=/root/repo/.tmpdata/sf1.0 \
        python -m pytest tests/test_driver_contract.py -q
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

SCALED = {
    "documents": """
        SELECT d.doc_id + r.r * n.n AS doc_id,
               d.text || ' rep' || r.r AS text,
               d.lang, d.source, d.n_chars
        FROM '{src}/documents.parquet' d,
             range({factor}) r(r),
             (SELECT COUNT(*) AS n FROM '{src}/documents.parquet') n
        ORDER BY doc_id""",
    "events": """
        SELECT e.event_id + r.r * n.n AS event_id,
               e.ts + INTERVAL (r.r) DAY AS ts,
               e.user_id + r.r * 100000 AS user_id,
               e.event_type, e.value, e.props
        FROM '{src}/events.parquet' e,
             range({factor}) r(r),
             (SELECT COUNT(*) AS n FROM '{src}/events.parquet') n
        ORDER BY event_id""",
    "embeddings": """
        SELECT v.vec_id + r.r * n.n AS vec_id, v.embedding, v.label
        FROM '{src}/embeddings.parquet' v,
             range({factor}) r(r),
             (SELECT COUNT(*) AS n FROM '{src}/embeddings.parquet') n
        ORDER BY vec_id""",
}

COPIED = "region nation customer supplier part orders lineitem".split()


def make_scale(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for name, sql in SCALED.items():
        q = sql.format(src=src, factor=factor)
        con.sql(
            f"COPY ({q}) TO '{out}/{name}.parquet' (FORMAT parquet)"
        )
    for name in COPIED:
        shutil.copyfile(f"{src}/{name}.parquet", f"{out}/{name}.parquet")
    for name in list(SCALED) + COPIED:
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    make_scale(a.src, a.out, a.factor)
