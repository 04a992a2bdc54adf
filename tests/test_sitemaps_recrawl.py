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
