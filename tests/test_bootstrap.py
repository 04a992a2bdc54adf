"""Self-describing site bootstrap: /robots.txt + /sitemap.xml endpoints
on the synthetic site, and `engine.bootstrap_from_robots()` — the
open-web startup sequence (robots -> per-host budgets relation +
sitemap-seeded round-0 frontier) with nothing hand-configured.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
from ba_gepris_crawler_spark.operators.transport import HttpTransport
from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
from ba_gepris_crawler_spark.sources.http_site import SyntheticSiteHTTPServer
from ba_gepris_crawler_spark.sources.synthetic_site import (
    SiteConfig,
    render_page,
    robots_body,
    sitemap_body,
)


def _site(**kw) -> SiteConfig:
    base = dict(
        hosts=("h0.example.org", "h1.example.org"),
        n_projects=12, n_persons=8, n_institutions=4,
        hits_per_page=5, seed=23,
    )
    base.update(kw)
    return SiteConfig(**base)


def test_metadata_endpoints_render(cfg):
    st, spans = render_page(cfg, f"https://{cfg.hosts[0]}/robots.txt")
    assert st == 200 and spans[0][0] == "raw"
    body = spans[0][1]
    assert "Crawl-delay: 1" in body  # host index 0 -> delay 1
    assert f"Sitemap: https://{cfg.hosts[0]}/sitemap.xml" in body
    st2, spans2 = render_page(cfg, f"https://{cfg.hosts[1]}/sitemap.xml")
    assert st2 == 200 and "<urlset" in spans2[0][1]
    # per-host delays actually differ (a bootstrap ignoring them is detectable)
    assert "Crawl-delay: 2" in robots_body(cfg, cfg.hosts[1])
    # partial listing: seeding accelerates, never replaces, discovery
    assert sitemap_body(cfg, cfg.hosts[0]).count("<loc>") > 0


def test_metadata_endpoints_unauthenticated():
    site = _site(session_rounds=2)  # detail pages demand a cookie...
    st, _ = render_page(site, f"https://{site.hosts[0]}/gepris/projekt/100001", None, 0)
    assert st == 401
    # ...robots/sitemap never do (RFC 9309 presumes open access)
    assert render_page(site, f"https://{site.hosts[0]}/robots.txt", None, 0)[0] == 200
    assert render_page(site, f"https://{site.hosts[0]}/sitemap.xml", None, 0)[0] == 200


def _engine(spark, tmp, site) -> CrawlEngine:
    return CrawlEngine(
        spark, site, SnapshotStore(spark, str(tmp)),
        CrawlSettings(
            n_buckets=4, extract=False,
            # round_seconds=30 so Crawl-delay 1-3s -> budgets 30/15/10
            # (round_seconds=1 would mean 1 page/host/round)
            politeness=PolitenessConfig(per_host_rate=40, round_seconds=30.0),
        ),
    )


def test_engine_bootstrap_budgets_and_seeds(spark, tmp_path_factory):
    site = _site()
    eng = _engine(spark, tmp_path_factory.mktemp("boot"), site)
    counts = eng.bootstrap_from_robots()
    assert counts["robots_fetched"] == len(site.hosts)
    assert counts["sitemap_seeds"] > 0
    # the budgets relation carries the site's OWN per-host Crawl-delays
    budgets = {r["host"]: r["budget"] for r in eng.budgets_df.collect()}
    assert budgets == {"h0.example.org": 30, "h1.example.org": 15}  # 30/delay

    eng.run(max_rounds=20)
    seen = eng.store.read_union("url_seen", eng.store.latest_round())
    r0 = {r["url"] for r in seen.filter(F.col("round") == 0).collect()}
    seeded = {r["url"] for r in eng.seed_urls_df.collect()} if eng.seed_urls_df is not None else set()
    # seed_urls_df was consumed by round 0; re-derive from the store: the
    # sitemap-listed detail pages must appear in round 0 (a plain crawl
    # reaches details only after catalog pagination)
    assert any("/gepris/" in u and "OCTOPUS" not in u for u in r0), r0

    # seeding + site-derived budgets accelerate but never change the crawl
    plain = _engine(spark, tmp_path_factory.mktemp("boot-plain"), _site())
    plain.run(max_rounds=20)
    assert {r["url"] for r in seen.select("url").collect()} == {
        r["url"] for r in plain.store.read_union(
            "url_seen", plain.store.latest_round()
        ).select("url").collect()
    } - {u for u in ()}  # same final seen set


def test_engine_bootstrap_over_real_http(spark, tmp_path_factory):
    site = _site()
    eng = _engine(spark, tmp_path_factory.mktemp("boot-http"), site)
    with SyntheticSiteHTTPServer(site) as srv:
        eng.transport = HttpTransport(srv.base_url)
        counts = eng.bootstrap_from_robots()
        budgets = {r["host"]: r["budget"] for r in eng.budgets_df.collect()}
    assert counts["robots_fetched"] == 2 and counts["sitemap_seeds"] > 0
    assert budgets == {"h0.example.org": 30, "h1.example.org": 15}


def test_engine_enforces_rules_relation(spark, tmp_path_factory):
    """engine.rules_df: robots Disallow groups as a RELATION evaluated on
    every round's candidates — disallowed URLs are never fetched, never
    enter url_seen, and the crawl still converges; the allowed remainder
    equals a rule-less crawl minus exactly the disallowed set."""
    from ba_gepris_crawler_spark.operators.politeness import (
        parse_robots_rules_distributed,
    )

    site = _site()
    eng = _engine(spark, tmp_path_factory.mktemp("rules"), site)
    robots = spark.createDataFrame(
        [("h0.example.org", "User-agent: *\nDisallow: /gepris/person/\n")],
        "host string, robots_txt string",
    )
    eng.rules_df = parse_robots_rules_distributed(robots)
    manifests = eng.run(max_rounds=20)
    assert manifests[-1]["counters"]["done"]
    assert manifests[0]["counters"]["rules_df"] is True
    seen = {
        r["url"] for r in eng.store.read_union(
            "url_seen", eng.store.latest_round()
        ).select("url").collect()
    }
    assert not any("h0.example.org/gepris/person/" in u for u in seen)
    assert any("h1.example.org/gepris/person/" in u for u in seen)  # unruled host

    plain = _engine(spark, tmp_path_factory.mktemp("rules-plain"), _site())
    plain.run(max_rounds=20)
    plain_seen = {
        r["url"] for r in plain.store.read_union(
            "url_seen", plain.store.latest_round()
        ).select("url").collect()
    }
    assert seen == {u for u in plain_seen if "h0.example.org/gepris/person/" not in u}

    # resume contract: the rules relation is data — a fresh engine must
    # refuse to continue without it
    import pytest as _pytest

    fresh = CrawlEngine(spark, site, eng.store, eng.s)
    with _pytest.raises(ValueError, match="rules_df"):
        fresh.resume(max_rounds=1)


def test_bootstrap_sets_rules_relation(spark, tmp_path_factory):
    site = _site()
    eng = _engine(spark, tmp_path_factory.mktemp("boot-rules"), site)
    eng.bootstrap_from_robots()
    rules = eng.rules_df.collect()
    hosts = {r["host"] for r in rules}
    assert hosts == set(site.hosts)  # every host's robots parsed
    assert any("/private/" in r["rx"] for r in rules)  # the served Disallow
