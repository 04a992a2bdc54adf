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


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    fn, oracle = REGISTRY[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    # no cache-by-comment contracts: a registry query must not leave
    # persisted RDDs behind for the harness to clear (local checkpoints
    # of bounded outputs are fine and excluded — they are the mechanism
    # that ENDS the cache contract)
    lingering = []
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        entry = it.next()
        jrdd = entry.getValue()
        if not jrdd.rdd().isCheckpointed():
            lingering.append((entry.getKey(), jrdd.name()))
    assert not lingering, f"{name} left cached RDDs: {lingering}"
    if oracle is None:
        pytest.skip("rows-only query (no SQL oracle)")
    ok, msg = compare(df, con, oracle)
    assert ok, f"{name}: {msg}"
