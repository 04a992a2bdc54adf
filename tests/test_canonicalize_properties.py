"""Property-style invariants for URL canonicalization, evaluated over an
adversarial corpus in ONE Spark job (hypothesis-per-example would pay a
Spark job per draw; the corpus keeps the same edge coverage at batch
cost). The invariants are the contract the URL-seen gate depends on:

- idempotence: canonical_url is a projection (canon(canon(u)) == canon(u))
  — the seen set stores canonical forms, and a re-canonicalized resume
  must not re-admit previously seen URLs;
- non-URL passthrough: strings without a scheme pass through unchanged
  (never silently rewritten into colliding keys);
- scheme-default ports alias (http :80 / https :443), every other
  (scheme, port) pair stays a distinct origin;
- fragments never distinguish URLs; case of scheme/host never does;
  path case always does.

Reference analog: the Scala crawler compares URLs literally
(CrawledResourceDetailDataGraph.scala:27) — safe for crawler-built URLs;
this gate faces open-web discovered URLs, hence the explicit contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.canonicalize import canonical_url, host_of

_SCHEMES = ["http", "HTTP", "https", "HtTpS", "ftp", "a+b-1.2"]
_HOSTS = ["h.example.org", "H.EXAMPLE.org", "h:80", "h:443", "h:8080", ""]
_RESTS = ["", "/", "/a/b", "/a/B", "/a?x=1&y=2", "/a?", "?", "#f", "/a#f#g",
          "/a%20b", "/a?x=%C3%A9", "/" + "s/" * 40]
_NON_URLS = ["", "not a url", "://nohost/p", "h.example.org/p", "mailto:x@y",
             "//proto-relative/p", "http:/one-slash", "日本語"]


def _corpus() -> list[str]:
    urls = [f"{s}://{h}{r}" for s in _SCHEMES for h in _HOSTS for r in _RESTS]
    return urls + _NON_URLS


def test_canonicalize_invariants_over_adversarial_corpus(spark):
    df = spark.createDataFrame([(u,) for u in _corpus()], "url string")
    out = df.select(
        "url",
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
        host_of("url").alias("h_raw"),
        host_of(canonical_url(F.col("url"))).alias("h_canon"),
    ).collect()
    for r in out:
        assert r["c2"] == r["c1"], f"not idempotent: {r['url']!r} -> {r['c1']!r} -> {r['c2']!r}"
        assert r["h_canon"] == r["h_raw"], f"host drift: {r['url']!r}"
        if "://" not in r["url"] or r["url"].startswith("://"):
            assert r["c1"] == r["url"], f"non-URL rewritten: {r['url']!r} -> {r['c1']!r}"


def test_canonicalize_aliasing_rules(spark):
    cases = [
        # (a, b, must_alias)
        ("http://h.example.org:80/p", "http://h.example.org/p", True),
        ("https://h.example.org:443/p", "https://h.example.org/p", True),
        ("HTTPS://H.EXAMPLE.ORG/p", "https://h.example.org/p", True),
        ("https://h.example.org/p#frag", "https://h.example.org/p", True),
        ("https://h.example.org/p?", "https://h.example.org/p", True),
        ("https://h.example.org", "https://h.example.org/", True),
        # distinct origins / resources must NOT alias
        ("https://h.example.org:80/p", "https://h.example.org/p", False),
        ("http://h.example.org:443/p", "http://h.example.org/p", False),
        ("ftp://h.example.org:80/p", "ftp://h.example.org/p", False),
        ("https://h.example.org/P", "https://h.example.org/p", False),
        ("https://h.example.org/p?x=1", "https://h.example.org/p", False),
        ("https://h.example.org/p/", "https://h.example.org/p", False),
    ]
    rows = spark.createDataFrame(cases, "a string, b string, must_alias boolean").select(
        "a", "b", "must_alias",
        (canonical_url(F.col("a")) == canonical_url(F.col("b"))).alias("aliased"),
    ).collect()
    for r in rows:
        assert r["aliased"] == r["must_alias"], (
            f"{r['a']!r} vs {r['b']!r}: aliased={r['aliased']}, want {r['must_alias']}"
        )
