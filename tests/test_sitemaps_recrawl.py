"""Sitemap ingestion + recrawl scheduling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.recrawl import due_frontier, recrawl_schedule
from ba_gepris_crawler_spark.operators.sitemaps import (
    parse_sitemap_entries,
    sitemap_frontier,
    sitemap_index_children,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://h.example.org/a?x=1&amp;y=2 </loc>
    <lastmod>2026-01-02</lastmod>
    <changefreq>WEEKLY</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://h.example.org/b</loc></url>
  <url><lastmod>2026-01-03</lastmod></url>
  <url><loc>https://h.example.org/c</loc><changefreq>sometimes</changefreq>
       <priority>9.5</priority></url>
  <url><loc>https://h.example.org/d&amp;lt;</loc><priority>bogus</priority></url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h.example.org/sitemap-1.xml</loc><lastmod>2026-01-01</lastmod></sitemap>
  <sitemap>
    <loc> https://h.example.org/sitemap-2.xml </loc>
  </sitemap>
  <sitemap><lastmod>no-loc-drops</lastmod></sitemap>
</sitemapindex>
"""


def _bodies(spark, body):
    return spark.createDataFrame(
        [("https://h.example.org/sitemap.xml", body)], "sitemap_url string, body string"
    )


def test_parse_urlset_fields(spark):
    rows = {r["loc"]: r for r in parse_sitemap_entries(_bodies(spark, URLSET)).collect()}
    # entry without loc dropped
    assert set(rows) == {
        "https://h.example.org/a?x=1&y=2",  # entity-decoded + trimmed
        "https://h.example.org/b",
        "https://h.example.org/c",
        "https://h.example.org/d&lt;",  # &amp;lt; decodes to &lt;, NOT <
    }
    a = rows["https://h.example.org/a?x=1&y=2"]
    assert a["lastmod"] == "2026-01-02"
    assert a["changefreq"] == "weekly"  # lowercased
    assert a["priority"] == 0.8
    b = rows["https://h.example.org/b"]
    assert b["lastmod"] is None and b["changefreq"] is None and b["priority"] == 0.5
    c = rows["https://h.example.org/c"]
    assert c["changefreq"] is None  # not one of the seven spec values
    assert c["priority"] == 1.0  # out-of-range clamps
    assert rows["https://h.example.org/d&lt;"]["priority"] == 0.5  # unparsable -> default


def test_parse_urlset_caps(spark):
    body = "<urlset>" + "".join(
        f"<url><loc>https://h.org/{i}</loc></url>" for i in range(20)
    ) + "</urlset>"
    got = parse_sitemap_entries(_bodies(spark, body), max_urls=5).count()
    assert got == 5  # hostile-size cap slices, never explodes
    # char cap truncates the body before the regex pass
    got2 = parse_sitemap_entries(_bodies(spark, body), max_chars=len("<urlset>") + 40).count()
    assert got2 <= 1


def test_parse_sitemap_index(spark):
    rows = sitemap_index_children(_bodies(spark, INDEX)).collect()
    assert [r["child_url"] for r in rows] == [
        "https://h.example.org/sitemap-1.xml",
        "https://h.example.org/sitemap-2.xml",
    ]
    assert all(r["sitemap_url"] == "https://h.example.org/sitemap.xml" for r in rows)


def test_sitemap_frontier_shape(spark):
    entries = parse_sitemap_entries(_bodies(spark, URLSET))
    fr = sitemap_frontier(entries, next_round=3)
    rows = {r["url"]: r for r in fr.collect()}
    a = rows["https://h.example.org/a?x=1&y=2"]
    assert a["host"] == "h.example.org"
    assert a["priority"] == 2  # (1 - 0.8) * 10
    assert a["crawl_depth"] == 0 and a["discovered_round"] == 3
    assert rows["https://h.example.org/b"]["priority"] == 5  # default 0.5


def test_recrawl_schedule_policy(spark):
    rows = []
    # u_static: 5 observations, never changes -> max_interval backoff
    rows += [("u_static", r, "h0") for r in range(5)]
    # u_hot: changes every observation over rounds 0..4 -> interval 1
    rows += [("u_hot", r, f"h{r}") for r in range(5)]
    # u_slow: rounds 0,2,4,6,8; one change -> interval span/1 = 8
    rows += [("u_slow", r, "a" if r < 6 else "b") for r in (0, 2, 4, 6, 8)]
    # u_new: single observation -> bootstrap interval
    rows += [("u_new", 9, "x")]
    # duplicate (url, round) rows tolerated (idempotent re-run)
    rows += [("u_static", 4, "h0")]
    hist = spark.createDataFrame(rows, "url string, round int, content_hash string")
    got = {
        r["url"]: r
        for r in recrawl_schedule(
            hist, now_round=10, min_interval=1, max_interval=16, bootstrap_interval=4
        ).collect()
    }
    assert got["u_static"]["n_obs"] == 5 and got["u_static"]["n_changes"] == 0
    assert got["u_static"]["interval"] == 16
    assert got["u_static"]["next_due"] == 4 + 16 and not got["u_static"]["due"]
    assert got["u_hot"]["n_changes"] == 4
    assert got["u_hot"]["interval"] == 1  # span 4 / 4 changes
    assert got["u_hot"]["due"]  # next_due 5 <= 10
    assert got["u_slow"]["n_changes"] == 1 and got["u_slow"]["interval"] == 8
    assert got["u_slow"]["next_due"] == 16 and not got["u_slow"]["due"]
    assert got["u_new"]["interval"] == 4 and got["u_new"]["due"] is False


def test_recrawl_clamps_and_validation(spark):
    import pytest

    hist = spark.createDataFrame(
        [("u", 0, "a"), ("u", 100, "b")], "url string, round int, content_hash string"
    )
    got = recrawl_schedule(hist, now_round=200, min_interval=2, max_interval=10).collect()[0]
    assert got["interval"] == 10  # span 100 / 1 change clamps to max
    with pytest.raises(ValueError):
        recrawl_schedule(hist, now_round=0, min_interval=5, max_interval=2)


def test_due_frontier_semi_join(spark):
    hist = spark.createDataFrame(
        [("u1", 0, "a"), ("u1", 1, "b"), ("u2", 0, "a"), ("u2", 1, "a")],
        "url string, round int, content_hash string",
    )
    sched = recrawl_schedule(hist, now_round=5, min_interval=1, max_interval=64)
    frontier = spark.createDataFrame(
        [("u1", "h"), ("u2", "h"), ("u3", "h")], "url string, host string"
    )
    kept = sorted(r["url"] for r in due_frontier(sched, frontier).collect())
    assert kept == ["u1"]  # u2 never changed (backoff), u3 unknown


# ---------------------------------------------------------------------------
# Engine integration: sitemap-seeded round 0 and the recrawl/tombstone cycle.
# ---------------------------------------------------------------------------

from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig, detail_url


def _site() -> SiteConfig:
    return SiteConfig(
        hosts=("h0.example.org", "h1.example.org"),
        n_projects=12, n_persons=8, n_institutions=4,
        hits_per_page=5, seed=23,
    )


def _engine(spark, tmp, site) -> CrawlEngine:
    return CrawlEngine(
        spark, site, SnapshotStore(spark, tmp),
        CrawlSettings(
            n_buckets=4, extract=False,
            politeness=PolitenessConfig(per_host_rate=40, round_seconds=1.0),
        ),
    )


def _sitemap_body(urls: list[str]) -> str:
    frags = "".join(
        f"<url><loc>{u.replace('&', '&amp;')}</loc></url>\n" for u in urls
    )
    return f'<?xml version="1.0"?>\n<urlset>\n{frags}</urlset>'


def test_engine_sitemap_seeds_fetch_in_round_zero(spark, tmp_path_factory):
    """Sitemap locs parsed by the REAL parser seed round 0 next to the
    catalog seeds: the listed detail pages are fetched in round 0 (a plain
    crawl reaches them only after catalog pagination), and the final seen
    set is identical — seeding accelerates, never changes, the crawl."""
    site = _site()
    listed = [detail_url(site, "person", rid) for rid in site.ids("person")[:5]]
    bodies = spark.createDataFrame(
        [("https://h0.example.org/sitemap.xml", _sitemap_body(listed))],
        "sitemap_url string, body string",
    )
    entries = parse_sitemap_entries(bodies)

    eng = _engine(spark, tmp_path_factory.mktemp("smseed"), _site())
    eng.seed_urls_df = entries.select(F.col("loc").alias("url"))
    eng.run(max_rounds=20)
    seeded_seen = eng.store.read_union("url_seen", eng.store.latest_round())
    r0 = {r["url"] for r in seeded_seen.filter(F.col("round") == 0).collect()}
    assert set(listed) <= r0

    plain = _engine(spark, tmp_path_factory.mktemp("plain"), _site())
    plain.run(max_rounds=20)
    plain_seen = plain.store.read_union("url_seen", plain.store.latest_round())
    assert {r["url"] for r in seeded_seen.select("url").collect()} == \
           {r["url"] for r in plain_seen.select("url").collect()}
    # in the plain crawl, detail pages can't appear before round 1
    assert not any("person" in u and "/gepris/person/" in u
                   for u in {r["url"] for r in plain_seen.filter(F.col("round") == 0).collect()})


def test_engine_recrawl_cycle_and_resume(spark, tmp_path_factory):
    """Full recrawl cycle: crawl to done -> enqueue_recrawl stages every
    bootstrap-due URL -> the next round refetches exactly that set (second
    url_seen row per URL, tombstone delta committed) -> the crawl
    re-converges -> a FRESH engine resume on the same store sees the
    tombstoned history and converges immediately without refetching."""
    site = _site()
    eng = _engine(spark, tmp_path_factory.mktemp("recrawl"), site)
    eng.run(max_rounds=20)
    store = eng.store
    done_round = store.latest_round()
    ok_urls = {
        r["url"]
        for r in store.read_union("url_seen", done_round)
        .filter(F.col("status") == 200).collect()
    }

    # single-observation URLs take bootstrap_interval=2; now = last+2 -> due
    n = eng.enqueue_recrawl(now_round=done_round + 2, max_interval=2, bootstrap_interval=2)
    assert n == len(ok_urls)
    manifests = eng.run(max_rounds=10, start_round=done_round + 1)
    refetch_round = done_round + 1
    assert manifests[0]["counters"]["recrawl_enqueued"] == n
    assert manifests[-1]["counters"]["done"]

    seen = store.read_union("url_seen", store.latest_round())
    per_url = {
        r["url"]: r["n"]
        for r in seen.filter(F.col("status") == 200)
        .groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_url) == ok_urls
    assert all(c == 2 for c in per_url.values()), "every due URL refetched exactly once"
    refetched = {r["url"] for r in seen.filter(F.col("round") == refetch_round).collect()}
    assert refetched == ok_urls

    # post-refetch history: two observations, zero changes (site is static)
    docs = store.read_union("documents", store.latest_round()).filter(F.col("status") == 200)
    hist = docs.select("url", "round", F.xxhash64(F.to_json(F.col("spans"))).alias("content_hash"))
    sched = recrawl_schedule(hist, now_round=refetch_round + 1, max_interval=8)
    two = sched.filter(F.col("n_obs") == 2)
    assert two.count() == len(ok_urls)
    assert two.filter(F.col("n_changes") != 0).count() == 0

    # fresh engine on the same store: tombstones replay from parquet; the
    # refetch rows (round > upto) keep every URL seen -> instant done
    eng2 = CrawlEngine(spark, site, store, eng.s)
    m2 = eng2.resume(max_rounds=5)
    assert m2[-1]["counters"]["done"]
    after = store.read_union("url_seen", store.latest_round())
    assert after.count() == seen.count(), "resume refetched nothing"


def test_sitemap_urls_from_robots(spark):
    """Sitemap: lines parse file-wide (user-agent independent), match
    case-insensitively, keep only absolute URLs, and survive the 500 KiB
    body cap; the plan is Python-free."""
    from ba_gepris_crawler_spark.operators.sitemaps import sitemap_urls_from_robots

    body = (
        "User-agent: a\nDisallow: /\n"
        "Sitemap: https://h.org/a.xml\n"
        "User-agent: b\n"
        "  SITEMAP:\thttps://h.org/b.xml.gz  \n"
        "sitemap: relative/drops.xml\n"
        "sitemapX: https://h.org/not-the-field.xml\n"
        "# Sitemap: https://h.org/commented-still-not-line-anchored.xml\n"
    )
    df = spark.createDataFrame([("h.org", body)], "host string, robots_txt string")
    out = sitemap_urls_from_robots(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    got = sorted(r["sitemap_url"] for r in out.collect())
    assert got == ["https://h.org/a.xml", "https://h.org/b.xml.gz"]


# ---------------------------------------------------------------------------
# gzipped sitemaps (.xml.gz): bounded inflate -> same parse as plain bodies
# ---------------------------------------------------------------------------

def test_gunzip_bodies_roundtrip_and_bombs(spark):
    import gzip as _gzip

    from ba_gepris_crawler_spark.operators.sitemaps import gunzip_bodies

    plain = URLSET
    rows = [
        ("https://h/ok.xml.gz", _gzip.compress(plain.encode("utf-8"))),
        ("https://h/plain.xml", plain.encode("utf-8")),       # pass-through
        ("https://h/corrupt.gz", b"\x1f\x8b" + b"garbage"),   # -> NULL
        ("https://h/bomb.gz", _gzip.compress(b"<url>" * 3_000_000)),  # inflate cap
        ("https://h/binary.bin", b"\xff\xfe\x00\x01"),        # undecodable -> NULL
    ]
    bodies = spark.createDataFrame(rows, "sitemap_url string, body_gz binary")
    got = {r["sitemap_url"]: r["body"]
           for r in gunzip_bodies(bodies, max_chars=100_000).collect()}
    assert got["https://h/ok.xml.gz"] == plain
    assert got["https://h/plain.xml"] == plain
    assert got["https://h/corrupt.gz"] is None
    assert got["https://h/binary.bin"] is None
    bomb = got["https://h/bomb.gz"]
    assert bomb is not None and len(bomb) <= 100_001  # inflate stopped at the cap

    # the inflated relation parses identically to a plain-text one
    from ba_gepris_crawler_spark.operators.sitemaps import parse_sitemap_entries

    inflated = gunzip_bodies(bodies, max_chars=100_000).filter(
        F.col("sitemap_url") == "https://h/ok.xml.gz"
    )
    want = {r["loc"] for r in parse_sitemap_entries(_bodies(spark, plain)).collect()}
    assert {r["loc"] for r in parse_sitemap_entries(inflated).collect()} == want


def test_gunzip_midchar_truncation_slices_not_drops(spark):
    """An over-limit body whose byte cut lands inside a multi-byte char
    must SLICE (valid prefix survives), never drop the whole sitemap."""
    from ba_gepris_crawler_spark.operators.sitemaps import gunzip_bodies

    body = ("x" * 99) + "ü" + "tail"  # 'ü' spans bytes 99-100 -> cut at 100 lands mid-char
    rows = [("u", body.encode("utf-8"))]
    bodies = spark.createDataFrame(rows, "sitemap_url string, body_gz binary")
    got = gunzip_bodies(bodies, max_chars=99).collect()[0]["body"]
    assert got == "x" * 99  # prefix recovered; nothing dropped
    # a genuinely undecodable (non-truncated) payload still nulls
    bad = spark.createDataFrame([("u", b"\xff\xfe")], "sitemap_url string, body_gz binary")
    assert gunzip_bodies(bad, max_chars=99).collect()[0]["body"] is None


def test_parse_accepts_binary_gz_bodies_directly(spark):
    """Product wiring: the parse entry points auto-inflate BINARY body
    columns, so a .xml.gz relation needs no separate gunzip call."""
    import gzip as _gzip

    from ba_gepris_crawler_spark.operators.sitemaps import (
        parse_sitemap_entries,
        sitemap_index_children,
    )

    gz = spark.createDataFrame(
        [("https://h/s.xml.gz", _gzip.compress(URLSET.encode("utf-8")))],
        "sitemap_url string, body binary",
    )
    want = {r["loc"] for r in parse_sitemap_entries(_bodies(spark, URLSET)).collect()}
    assert {r["loc"] for r in parse_sitemap_entries(gz).collect()} == want

    gzi = spark.createDataFrame(
        [("https://h/i.xml.gz", _gzip.compress(INDEX.encode("utf-8")))],
        "sitemap_url string, body binary",
    )
    assert [r["child_url"] for r in sitemap_index_children(gzi).collect()] == [
        "https://h.example.org/sitemap-1.xml",
        "https://h.example.org/sitemap-2.xml",
    ]
