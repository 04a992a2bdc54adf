"""Bloom-shard URL-seen filter + canonicalization unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators import url_seen as US
from ba_gepris_crawler_spark.operators.canonicalize import canonical_url, host_of


def _urls(spark, n, prefix="https://h.example.org/p"):
    return spark.range(n).select(F.concat(F.lit(prefix), F.col("id")).alias("url"))


def test_bloom_no_false_negatives(spark):
    seen = _urls(spark, 5000)
    bloom = US.build_bloom(seen, fpp=0.01)
    definitely_new, maybe_seen = US.split_by_bloom(seen, bloom)
    assert definitely_new.count() == 0  # every seen url must test positive
    assert maybe_seen.count() == 5000


def test_bloom_fpp_in_range(spark):
    seen = _urls(spark, 5000)
    bloom = US.build_bloom(seen, fpp=0.01)
    fresh = _urls(spark, 20000, prefix="https://other.example.org/q")
    _, maybe = US.split_by_bloom(fresh, bloom)
    fp_rate = maybe.count() / 20000
    assert fp_rate < 0.05, fp_rate  # target 1%, generous bound


def test_new_urls_exact_with_and_without_bloom(spark):
    frontier = _urls(spark, 1000)
    seen = _urls(spark, 600).withColumn("round", F.lit(0))  # first 600 seen
    bloom = US.build_bloom(seen, fpp=0.01)
    no_bloom = {r.url for r in US.new_urls(frontier, seen).collect()}
    with_bloom = {r.url for r in US.new_urls(frontier, seen, bloom).collect()}
    assert no_bloom == with_bloom
    assert len(no_bloom) == 400


def test_canonicalize(spark):
    cases = [
        ("HTTPS://Gepris.Example.ORG:443/gepris/projekt/5#frag", "https://gepris.example.org/gepris/projekt/5"),
        ("http://Host.de:80/a?x=1", "http://host.de/a?x=1"),
        ("https://h.de", "https://h.de/"),
        ("https://h.de/p?", "https://h.de/p"),
        # NON-default ports are distinct origins and must survive
        ("https://h.de:80/x", "https://h.de:80/x"),
        ("http://h.de:443/x", "http://h.de:443/x"),
        ("ftp://h.de:80/x", "ftp://h.de:80/x"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [w for _, w in cases]
    hosts = [r.h for r in df.select(host_of("url").alias("h")).collect()]
    assert hosts[0] == "gepris.example.org"


def test_new_urls_exact_path_has_no_seen_side_shuffle_aggregate(spark):
    """The exact anti-join must NOT dedup its right side: left_anti is
    duplicate-tolerant there and url_seen rows are unique per URL by
    construction, so a dropDuplicates would full-shuffle the largest table
    in the system (10^9+ rows at web scale) every round for identical
    results (review r5 #7). Plan-asserted: no Aggregate anywhere in the
    exact path's physical plan — and results are still exact even if the
    right side DOES carry duplicate URLs."""
    frontier = _urls(spark, 100)
    seen = _urls(spark, 60).withColumn("round", F.lit(0))
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        US.new_urls(frontier, seen)._jdf.queryExecution(), "formatted"
    )
    assert "Aggregate" not in plan, plan
    dup_seen = seen.unionByName(seen)  # duplicate-tolerance backstop
    got = {r.url for r in US.new_urls(frontier, dup_seen).collect()}
    assert len(got) == 40
