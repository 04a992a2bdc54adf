"""Replicates the driver's verify: every REGISTRY query runs in Spark and
DuckDB at sf0.01 and must match (columns + row multiset)."""

from __future__ import annotations

import pytest

from ba_gepris_crawler_spark.plans.driver_queries import REGISTRY
from ba_gepris_crawler_spark.testing.oracle_check import compare, duck_connection

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF_DIR)


def _persistent_rdds(spark) -> dict[int, str]:
    out = {}
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        entry = it.next()
        jrdd = entry.getValue()
        if not jrdd.rdd().isCheckpointed():
            out[entry.getKey()] = jrdd.name()
    return out


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    fn, oracle = REGISTRY[name]
    before = set(_persistent_rdds(spark))
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    # no cache-by-comment contracts: a registry query must not leave
    # persisted RDDs behind for the harness to clear (local checkpoints
    # of bounded outputs are fine and excluded — they are the mechanism
    # that ENDS the cache contract). Diff against the pre-query snapshot
    # so caches left by OTHER test files don't fail every registry row.
    after = _persistent_rdds(spark)
    lingering = [(k, v) for k, v in after.items() if k not in before]
    assert not lingering, f"{name} left cached RDDs: {lingering}"
    if oracle is None:
        pytest.skip("rows-only query (no SQL oracle)")
    ok, msg = compare(df, con, oracle)
    assert ok, f"{name}: {msg}"
