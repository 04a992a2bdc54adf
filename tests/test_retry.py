"""Transient-error retry scheduling (operators/retry.py +
CrawlEngine.enqueue_error_retries).

Pins: the backoff/exhaustion arithmetic, newest-observation gating
(a later 200 ends the retry lineage; 404 is an answer, not a failure),
and the engine e2e — a permanently-503 site deepens backoff until
exhaustion, a fixed site turns the quarantined URLs into 200s WITH typed
extraction, through the same tombstone/readmission machinery as recrawl.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
from ba_gepris_crawler_spark.operators.retry import due_retry_urls, error_retry_schedule
from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, round int, status int")


def test_retry_policy_arithmetic(spark):
    rows = [
        ("u_once", 0, 503),                                  # 1 attempt -> due at 0+2
        ("u_twice", 0, 599), ("u_twice", 3, 503),            # 2 attempts -> due at 3+4
        ("u_gone", 0, 503), ("u_gone", 2, 200),              # lineage ended by the 200
        ("u_404", 0, 404),                                   # an answer, never retried
        ("u_ex", 0, 503), ("u_ex", 2, 503), ("u_ex", 4, 503),
        ("u_ex", 6, 503),                                    # 4 attempts = max -> exhausted
        ("u_clamp", 0, 503), ("u_clamp", 1, 503), ("u_clamp", 2, 503),  # 2^3 clamps to 6
        # duplicate (url, round) rows tolerated: max status wins
        ("u_once", 0, 503),
    ]
    got = {
        r["url"]: r
        for r in error_retry_schedule(
            _hist(spark, rows), now_round=7, max_attempts=4, backoff_base=2, max_backoff=6
        ).collect()
    }
    assert set(got) == {"u_once", "u_twice", "u_ex", "u_clamp"}  # gone/404 excluded
    assert got["u_once"]["n_attempts"] == 1 and got["u_once"]["delay"] == 2
    assert got["u_once"]["next_due"] == 2 and got["u_once"]["due"]
    assert got["u_twice"]["delay"] == 4 and got["u_twice"]["next_due"] == 7
    assert got["u_twice"]["due"]  # 7 <= now 7
    assert got["u_ex"]["exhausted"] and not got["u_ex"]["due"]
    assert got["u_clamp"]["delay"] == 6  # 2^3=8 clamped to max_backoff
    assert got["u_clamp"]["next_due"] == 8 and not got["u_clamp"]["due"]  # 8 > now 7
    assert sorted(r["url"] for r in due_retry_urls(
        error_retry_schedule(_hist(spark, rows), now_round=7, max_attempts=4,
                             backoff_base=2, max_backoff=6)
    ).collect()) == ["u_once", "u_twice"]


def test_retry_streak_resets_after_success(spark):
    """n_attempts counts the CURRENT failure streak, not lifetime
    failures: a URL that failed, recovered, and failed again starts a
    fresh lineage — lifetime counting would exhaust it prematurely."""
    rows = [
        ("u", 0, 503), ("u", 2, 200), ("u", 10, 503), ("u", 14, 200),
        ("u", 20, 503), ("u", 24, 200), ("u", 30, 503),
    ]
    got = error_retry_schedule(
        _hist(spark, rows), now_round=40, max_attempts=4, backoff_base=2
    ).collect()[0]
    assert got["n_attempts"] == 1  # only the round-30 failure counts
    assert not got["exhausted"] and got["due"]  # 30 + 2 <= 40


def test_retry_validation(spark):
    with pytest.raises(ValueError):
        error_retry_schedule(_hist(spark, [("u", 0, 503)]), now_round=1, max_attempts=0)


def test_retry_not_due_yet(spark):
    got = error_retry_schedule(
        _hist(spark, [("u", 5, 503)]), now_round=6, backoff_base=4
    ).collect()[0]
    assert got["next_due"] == 9 and not got["due"] and not got["exhausted"]


# ---------------------------------------------------------------------------
# engine e2e
# ---------------------------------------------------------------------------

def _site(**kw) -> SiteConfig:
    base = dict(
        hosts=("h0.example.org", "h1.example.org"),
        n_projects=12, n_persons=8, n_institutions=4,
        hits_per_page=5, seed=23,
    )
    base.update(kw)
    return SiteConfig(**base)


def _engine(spark, tmp, site, **skw) -> CrawlEngine:
    return CrawlEngine(
        spark, site, SnapshotStore(spark, str(tmp)),
        CrawlSettings(
            n_buckets=4,
            politeness=PolitenessConfig(per_host_rate=40, round_seconds=1.0),
            **skw,
        ),
    )


def test_engine_retries_until_exhaustion_then_recovers(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("retry")
    broken = _site(error_mod=5)
    eng = _engine(spark, tmp, broken, extract=True)
    eng.run(max_rounds=20)
    errs = eng.store.read_union("documents", eng.store.latest_round()).filter(
        F.col("status") == 503
    )
    n_err = errs.count()
    err_urls = {r["url"] for r in errs.select("url").collect()}
    assert n_err > 0
    eav0 = eng.store.read_union("eav", eng.store.latest_round()).count()

    # attempt 2: still broken -> every retry 503s again, backoff deepens
    n = eng.enqueue_error_retries(now_round=eng.store.latest_round() + 100,
                                  max_attempts=3)
    assert n == n_err
    c = eng.run_round(eng.store.latest_round() + 1)["counters"]
    assert c["errors"] == n_err and c["fetched"] == n_err

    # attempt 3: same again -> now at max_attempts
    n2 = eng.enqueue_error_retries(now_round=eng.store.latest_round() + 100,
                                   max_attempts=3)
    assert n2 == n_err
    eng.run_round(eng.store.latest_round() + 1)
    # exhausted: nothing stages under the same policy
    assert eng.enqueue_error_retries(now_round=eng.store.latest_round() + 100,
                                     max_attempts=3) == 0
    assert eng.store.read_union("eav", eng.store.latest_round()).count() == eav0

    # the server is fixed: a wider attempt budget revives the quarantine,
    # the refetch 200s, and typed extraction finally covers the resources
    fixed = _engine(spark, tmp, _site(), extract=True)
    n3 = fixed.enqueue_error_retries(now_round=fixed.store.latest_round() + 100,
                                     max_attempts=10)
    assert n3 == n_err
    c3 = fixed.run_round(fixed.store.latest_round() + 1)["counters"]
    assert c3["errors"] == 0 and c3["fetched"] == n_err
    rnd = c3["round"]
    got = fixed.store.read_state("documents", rnd).filter(F.col("status") == 200)
    assert {r["url"] for r in got.select("url").collect()} == err_urls
    assert fixed.store.read_union("eav", rnd).count() > eav0
    # lineage ended: nothing left to retry, even with a huge budget
    assert fixed.enqueue_error_retries(now_round=rnd + 100, max_attempts=10) == 0


@pytest.mark.parametrize("retries_first", [False, True])
def test_retry_composes_with_staged_recrawl(spark, tmp_path_factory, retries_first):
    """Content recrawl and error retry stage into the same refetch round
    — in EITHER call order (staging unions, never clobbers); the round
    refetches both sets."""
    tmp = tmp_path_factory.mktemp(f"retry-compose-{retries_first}")
    eng = _engine(spark, tmp, _site(error_mod=5), extract=False)
    eng.run(max_rounds=20)
    latest = eng.store.latest_round()
    if retries_first:
        n_er = eng.enqueue_error_retries(now_round=latest + 100)
        n_re = eng.enqueue_recrawl(now_round=latest + 100)
    else:
        n_re = eng.enqueue_recrawl(now_round=latest + 100)
        n_er = eng.enqueue_error_retries(now_round=latest + 100)
    assert n_re > 0 and n_er > 0
    c = eng.run_round(latest + 1)["counters"]
    assert c["fetched"] == n_re + n_er  # disjoint sets (recrawl = 200/304 history)
    assert c["errors"] == n_er  # the 503s are still 503
