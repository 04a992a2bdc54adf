"""Bucketed co-located join: the 100 TB strategy for the repeated
frontier-vs-seen anti-join (SURVEY.md §2.3 J1). Writing both sides
bucketed by the join key lets every subsequent join run shuffle-free —
the parquet+manifest analog of what the compacted hash-clustered url_seen
snapshot gives read_union. Asserted on the PLAN: the join of two
co-bucketed tables must contain NO Exchange on either side."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    # warehouse dir is a static conf on the shared session — park the
    # bucketed tables at explicit external paths instead
    wh = tmp_path_factory.mktemp("warehouse")
    # force the sort-merge path: with broadcast allowed the no-Exchange
    # assertion would pass vacuously (broadcast joins never shuffle)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS frontier_b")
    seen = spark.range(5000).select(
        F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url"),
        F.lit(200).alias("status"),
    )
    frontier = spark.range(2500, 7500).select(
        F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url"),
        F.lit(1).alias("crawl_depth"),
    )
    (seen.write.bucketBy(8, "url").sortBy("url").option("path", str(wh / "seen_b"))
         .mode("overwrite").saveAsTable("seen_b"))
    (frontier.write.bucketBy(8, "url").sortBy("url").option("path", str(wh / "frontier_b"))
             .mode("overwrite").saveAsTable("frontier_b"))
    yield "frontier_b", "seen_b"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS frontier_b")


def _plan(df) -> str:
    return df.sparkSession._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_cobucketed_anti_join_has_no_exchange(spark, bucketed_pair):
    f_name, s_name = bucketed_pair
    f = spark.table(f_name)
    s = spark.table(s_name)
    new = f.join(s, "url", "left_anti")
    plan = _plan(new)
    assert "SortMergeJoin" in plan, plan  # not a vacuous broadcast pass
    assert not re.search(r"\(\d+\) Exchange", plan), plan
    # and it is correct: ids 2500..4999 are seen, 5000..7499 are new
    assert new.count() == 2500
    got = {r.url for r in new.limit(5001).collect()}
    assert all(int(u.rsplit("/", 1)[1]) >= 5000 for u in got)


def test_cobucketed_equi_join_has_no_exchange(spark, bucketed_pair):
    f_name, s_name = bucketed_pair
    joined = spark.table(f_name).join(spark.table(s_name), "url")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert not re.search(r"\(\d+\) Exchange", plan), plan
    assert joined.count() == 2500  # overlap 2500..4999
