"""Self-check of the driver contract: every queries() entry must match its
oracle_sql() twin at sf0.01 — exactly the comparison the driver's
CORRECTNESS gate performs."""

from __future__ import annotations

import importlib.util
import sys

import pytest

from .conftest import SF_MED, SF_SMALL, compare_query

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
entry_mod = importlib.util.module_from_spec(spec)
sys.modules["__spark_entry__"] = entry_mod
spec.loader.exec_module(entry_mod)

QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["pred", "n"]


def test_oracle_keys_subset():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, f"oracle entries without queries: {o - q}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_oracle(spark, duck_med, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        # rows-only check for non-SQL-expressible ops
        assert q(spark, SF_MED).count() >= 0
        return
    compare_query(spark, duck_med, q(spark, SF_MED), oracles[name])
