"""Redirect resolution: Location absolutization vs urllib.parse.urljoin,
pointer-doubling chain resolution vs a straight-line Python walk."""

from __future__ import annotations

from urllib.parse import urljoin

from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.redirects import (
    absolutize_location,
    doubling_rounds,
    redirect_edges,
    redirect_frontier,
    resolve_redirects,
)

BASE = "https://h0.example.org/a/b/page?q=1#frag"

LOCATION_CASES = [
    # absolute forms pass through
    "https://other.example.org/x",
    "http://h0.example.org:8080/y?z=2",
    # protocol-relative takes the source scheme
    "//cdn.example.org/lib.js",
    # absolute path takes the source origin
    "/root/here",
    "/root/here?a=b#c",
    # relative forms merge with the source directory
    "sibling",
    "sibling?x=1",
    "sub/dir/leaf",
    "./same",
    "../up",
    "../../up2",
    "../../../past-root",  # never pops past root
    "..",
    ".",
    # query/fragment-only references replace the tail
    "?only=query",
    "#only-frag",
]


def test_absolutize_matches_urljoin(spark):
    df = spark.createDataFrame([(BASE, c) for c in LOCATION_CASES], "src string, loc string")
    got = {
        r["loc"]: r["abs"]
        for r in df.select("loc", absolutize_location("src", "loc").alias("abs")).collect()
    }
    for c in LOCATION_CASES:
        expect = urljoin(BASE, c)
        assert got[c] == expect, f"{c!r}: {got[c]!r} != urljoin {expect!r}"


def test_absolutize_null_and_empty(spark):
    df = spark.createDataFrame([(BASE, None), (BASE, "")], "src string, loc string")
    vals = [r["abs"] for r in df.select(absolutize_location("src", "loc").alias("abs")).collect()]
    assert vals == [None, None]


def test_absolutize_bare_host_source(spark):
    # a source URL with no path at all: relative refs resolve against '/'
    df = spark.createDataFrame(
        [("https://h.example.org", "x"), ("https://h.example.org", "?q=1")],
        "src string, loc string",
    )
    vals = [r["abs"] for r in df.select(absolutize_location("src", "loc").alias("abs")).collect()]
    assert vals == ["https://h.example.org/x", "https://h.example.org/?q=1"]


def _py_resolve(edges: dict[str, str], src: str, max_hops: int) -> tuple[str | None, bool]:
    cur, hops = src, 0
    while cur in edges:
        cur = edges[cur]
        hops += 1
        if hops > max_hops:
            return None, False
    return cur, True


def test_resolve_chains_loops_and_cap(spark):
    # u0 -> u1 -> ... -> t (chains of several lengths), a 2-loop, a self-ref
    edges = {}
    for length in (1, 2, 3, 7, 10, 11):  # 11 > max_hops=10 -> capped
        for i in range(length):
            edges[f"https://c{length}.org/{i}"] = f"https://c{length}.org/{i + 1}"
    edges["https://loop.org/a"] = "https://loop.org/b"
    edges["https://loop.org/b"] = "https://loop.org/a"
    df = spark.createDataFrame(list(edges.items()), "src string, dst string")
    got = {r["src"]: r for r in resolve_redirects(df, max_hops=10).collect()}
    assert set(got) == set(edges)
    for src in edges:
        final, ok = _py_resolve(edges, src, 10)
        assert got[src]["resolved"] == ok, src
        assert got[src]["final_url"] == final, src
        if ok and src.startswith("https://c"):
            # exact hop count for resolved chains: chain c{L}, node i -> L - i
            length = int(src.split("//c")[1].split(".")[0])
            i = int(src.rsplit("/", 1)[1])
            assert got[src]["hops"] == length - i, src


def test_resolve_hop_counts_exact(spark):
    edges = {f"u{i}": f"u{i + 1}" for i in range(5)}  # u0..u4 -> terminal u5
    df = spark.createDataFrame(list(edges.items()), "src string, dst string")
    got = {r["src"]: r["hops"] for r in resolve_redirects(df, max_hops=8).collect()}
    assert got == {f"u{i}": 5 - i for i in range(5)}


def test_doubling_rounds():
    assert doubling_rounds(1) == 1
    assert doubling_rounds(2) == 1
    assert doubling_rounds(3) == 2
    assert doubling_rounds(10) == 4
    assert doubling_rounds(16) == 4
    assert doubling_rounds(17) == 5


def test_redirect_edges_dedup_and_absolutize(spark):
    rows = [
        ("https://h.org/a", 301, "/b"),           # absolutized
        ("https://h.org/a", 302, "/a2"),          # dup src: min(dst) wins
        ("https://h.org/c", 200, "/ignored"),     # non-3xx dropped
        ("https://h.org/d", 307, None),           # no Location dropped
        ("https://h.org/e", 308, "https://h.org/e"),  # self-edge dropped
    ]
    df = spark.createDataFrame(rows, "url string, status int, location string")
    got = {r["src"]: r["dst"] for r in redirect_edges(df).collect()}
    assert got == {"https://h.org/a": "https://h.org/a2"}


def test_redirect_frontier_rows(spark):
    edges = spark.createDataFrame(
        [("https://h.org/old", "https://h2.org/new")], "src string, dst string"
    )
    resolved = resolve_redirects(edges, max_hops=4)
    docs = spark.createDataFrame([("https://h.org/old", 3)], "url string, crawl_depth int")
    rows = redirect_frontier(resolved, docs, next_round=7).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "https://h2.org/new"
    assert r["host"] == "h2.org"
    assert r["crawl_depth"] == 4
    assert r["discovered_round"] == 7
