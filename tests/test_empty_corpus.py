"""Degenerate-input robustness: EVERY registered query must run on an
empty corpus (0-row tables with the production schemas) without raising —
the guard that a fresh deployment, an all-filtered partition, or a
first-batch race never kills a 1000-executor job. (The r3-ADVICE shingle
crash was exactly this class: a sub-k-token document took down the whole
scan.)"""

from __future__ import annotations

import os
import tempfile

import pytest

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    """An sf-dir whose tables carry the production schemas but zero rows."""
    d = tempfile.mkdtemp()
    for name in os.listdir(SF_SMALL):
        if not name.endswith(".parquet"):
            continue
        src = spark.read.parquet(os.path.join(SF_SMALL, name))
        src.limit(0).write.mode("overwrite").parquet(os.path.join(d, name))
    return d


def _query_names():
    import __spark_entry__ as E

    return sorted(E.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    import __spark_entry__ as E

    df = E.queries()[name](spark, empty_sf_dir)
    assert df.count() >= 0  # executes the whole plan; no exception = pass
