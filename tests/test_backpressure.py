"""Per-host circuit breaker (operators/backpressure.py + the round-loop
suspension arm).

Pins: the trip rule (transient classes only — 404s never trip), the
active/lapsed resolution, and the engine e2e invariant that suspension
DEFERS, never drops: a breaker crawl of a half-broken site converges to
exactly the same final seen set as a breaker-less crawl, with zero
fetches against the suspended host during its suspension window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.backpressure import (
    active_suspensions,
    split_suspended,
    tripped_hosts,
)
from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig


def test_trip_rule(spark):
    rows = (
        [("h_down", 503)] * 10
        + [("h_half", 503)] * 5 + [("h_half", 200)] * 5
        + [("h_404", 404)] * 10            # answers, not failures
        + [("h_ok", 200)] * 10
        + [("h_small", 503)] * 3           # under min_fetches
    )
    docs = spark.createDataFrame(rows, "host string, status int")
    got = {r["host"]: r["until_round"] for r in tripped_hosts(
        docs, next_round=5, min_fetches=4, error_rate=0.5, suspend_rounds=3
    ).collect()}
    assert got == {"h_down": 7, "h_half": 7}  # inclusive: 5, 6, 7
    with pytest.raises(ValueError):
        tripped_hosts(docs, next_round=5, error_rate=0.0)


def test_active_resolution(spark):
    susp = spark.createDataFrame(
        [("a", 3), ("a", 9), ("b", 6), ("c", 7)], "host string, until_round int"
    )
    assert sorted(r["host"] for r in active_suspensions(susp, rnd=7).collect()) == ["a", "c"]
    # boundary: until_round is inclusive
    assert sorted(r["host"] for r in active_suspensions(susp, rnd=6).collect()) == ["a", "b", "c"]


def test_split_preserves_rows(spark):
    cand = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "a")], "url string, host string"
    )
    active = spark.createDataFrame([("a",)], "host string")
    keep, susp = split_suspended(cand, active)
    assert sorted(r["url"] for r in keep.collect()) == ["u2"]
    assert sorted(r["url"] for r in susp.collect()) == ["u1", "u3"]


# ---------------------------------------------------------------------------
# engine e2e
# ---------------------------------------------------------------------------

def _engine(spark, tmp, cb) -> CrawlEngine:
    # hosts alternate by id; error_mod=2 makes every even id 503 -> the
    # even-id host's detail fetches all fail while its catalogs stay 200
    site = SiteConfig(
        hosts=("h0.example.org", "h1.example.org"),
        n_projects=12, n_persons=8, n_institutions=4,
        hits_per_page=5, seed=23, error_mod=2,
    )
    return CrawlEngine(
        spark, site, SnapshotStore(spark, str(tmp)),
        CrawlSettings(
            n_buckets=4, extract=False, circuit_breaker=cb,
            politeness=PolitenessConfig(per_host_rate=40, round_seconds=1.0),
        ),
    )


def test_engine_breaker_defers_and_converges_equal(spark, tmp_path_factory):
    cb = {"min_fetches": 4, "error_rate": 0.5, "suspend_rounds": 2}
    eng = _engine(spark, tmp_path_factory.mktemp("breaker"), cb)
    manifests = eng.run(max_rounds=30)
    assert manifests[-1]["counters"]["done"]
    counters = [m["counters"] for m in manifests]
    tripped_rounds = [c["round"] for c in counters if c.get("hosts_suspended")]
    assert tripped_rounds, "the half-broken host never tripped"

    susp = eng.store.read_union("host_suspensions", eng.store.latest_round())
    rows = susp.collect()
    assert {r["host"] for r in rows} == {"h0.example.org"}  # even ids
    # zero fetches against the suspended host inside its window
    for s in rows:
        first_skip = None
        for c in counters:
            if c["round"] > s["until_round"]:
                break
            if c["round"] > tripped_rounds[0]:
                first_skip = c["round"]
                n = eng.store.read_state("documents", c["round"]).filter(
                    F.col("host") == s["host"]
                ).count()
                assert n == 0, f"suspended host fetched at round {c['round']}"
        assert first_skip is not None  # the window actually covered a round

    # THE invariant: suspension defers, never drops — same final seen set
    # (and same per-url final status) as a breaker-less crawl
    plain = _engine(spark, tmp_path_factory.mktemp("plain"), None)
    plain.run(max_rounds=30)
    breaker_seen = {
        (r["url"], r["status"])
        for r in eng.store.read_union("url_seen", eng.store.latest_round())
        .groupBy("url").agg(F.max_by("status", "round").alias("status")).collect()
    }
    plain_seen = {
        (r["url"], r["status"])
        for r in plain.store.read_union("url_seen", plain.store.latest_round())
        .groupBy("url").agg(F.max_by("status", "round").alias("status")).collect()
    }
    assert breaker_seen == plain_seen
    # and the breaker actually cost extra rounds (the deferral happened)
    assert eng.store.latest_round() > plain.store.latest_round()


def test_engine_breaker_resume_replays_suspensions(spark, tmp_path_factory):
    """A fresh engine resuming mid-suspension sees the committed
    suspensions table and keeps skipping the host."""
    cb = {"min_fetches": 4, "error_rate": 0.5, "suspend_rounds": 3}
    tmp = tmp_path_factory.mktemp("breaker-resume")
    eng = _engine(spark, tmp, cb)
    # run only up to the first trip
    rnd = 0
    while True:
        c = eng.run_round(rnd)["counters"]
        if c.get("hosts_suspended"):
            break
        rnd += 1
        assert rnd < 10
    fresh = _engine(spark, tmp, cb)
    m = fresh.resume(max_rounds=1)[0]["counters"]
    n = fresh.store.read_state("documents", m["round"]).filter(
        F.col("host") == "h0.example.org"
    ).count()
    assert n == 0  # the resumed round honored the committed suspension
