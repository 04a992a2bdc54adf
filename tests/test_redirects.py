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


# ---------------------------------------------------------------------------
# Engine integration: follow_redirects in the round loop, over BOTH the
# in-process transport and real HTTP (Location header round-trip).
# ---------------------------------------------------------------------------

from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig


def _site(redirect_mod: int) -> SiteConfig:
    return SiteConfig(
        hosts=("h0.example.org", "h1.example.org"),
        n_projects=14, n_persons=8, n_institutions=4,
        hits_per_page=6, seed=19, redirect_mod=redirect_mod,
    )


def _crawl(spark, tmp, site, follow: bool, extract: bool = True):
    store = SnapshotStore(spark, tmp)
    eng = CrawlEngine(
        spark, site, store,
        CrawlSettings(
            n_buckets=4, extract=extract, follow_redirects=follow,
            politeness=PolitenessConfig(per_host_rate=50, round_seconds=1.0),
        ),
    )
    manifests = eng.run(max_rounds=20)
    return store, manifests


def _moved_ids(site: SiteConfig) -> set[str]:
    out = set()
    for rtype in ("project", "person", "institution"):
        base = site.id_base[rtype]
        out |= {str(base + i) for i in range(site.n_of(rtype))
                if (base + i) % site.redirect_mod == 0}
    return out


def test_engine_follow_redirects_extraction_equality(spark, tmp_path_factory):
    """A crawl over the redirecting site with follow_redirects=True must
    extract byte-equal typed tables to a crawl of the same site without
    redirects: the 301 hop adds a round and a quarantined status row but
    never changes WHAT is extracted."""
    site_r = _site(redirect_mod=4)
    site_p = _site(redirect_mod=0)
    store_r, man_r = _crawl(spark, tmp_path_factory.mktemp("red"), site_r, follow=True)
    store_p, man_p = _crawl(spark, tmp_path_factory.mktemp("plain"), site_p, follow=False)

    for table in ("projects", "persons", "institutions", "eav"):
        a = store_r.read_union(table, store_r.latest_round())
        b = store_p.read_union(table, store_p.latest_round())
        cols = sorted(c for c in a.columns if c != "round")
        got = sorted(map(tuple, a.select(*cols).collect()))
        want = sorted(map(tuple, b.select(*cols).collect()))
        assert got == want, table

    # every moved resource left a 301 source row AND a 200 canonical row
    seen = store_r.read_union("url_seen", store_r.latest_round())
    moved = _moved_ids(site_r)
    got301 = {r["url"] for r in seen.filter(F.col("status") == 301).collect()}
    got200 = {r["url"] for r in seen.filter(F.col("status") == 200).collect()}
    for rid in moved:
        assert any(f"/{rid}?" in u and "canonical=1" not in u for u in got301), rid
        assert any(f"/{rid}?" in u and "canonical=1" in u for u in got200), rid
    # manifest counters account for exactly the moved set
    assert sum(m["counters"].get("redirects", 0) for m in man_r) == len(moved)
    assert sum(m["counters"].get("redirects", 0) for m in man_p) == 0


def test_engine_redirects_off_quarantines_targets_unfetched(spark, tmp_path_factory):
    """follow_redirects=False (reference semantics): the 301 rows quarantine
    and their canonical targets are never fetched."""
    site = _site(redirect_mod=4)
    store, _ = _crawl(spark, tmp_path_factory.mktemp("noff"), site, follow=False, extract=False)
    seen = store.read_union("url_seen", store.latest_round())
    assert seen.filter(F.col("status") == 301).count() == len(_moved_ids(site))
    assert seen.filter(F.col("url").contains("canonical=1")).count() == 0


def test_http_transport_redirect_crawl_equals_in_process(spark, tmp_path_factory):
    """Real-socket redirects: the Location HEADER emitted by the localhost
    server must round-trip through HttpTransport into the same crawl the
    in-process location-span path produces (url_seen set + statuses equal,
    documents span-equal)."""
    from ba_gepris_crawler_spark.operators.transport import HttpTransport
    from ba_gepris_crawler_spark.sources.http_site import SyntheticSiteHTTPServer

    site = _site(redirect_mod=5)
    store_a, _ = _crawl(spark, tmp_path_factory.mktemp("inproc"), site, follow=True, extract=False)

    with SyntheticSiteHTTPServer(site) as srv:
        store_b = SnapshotStore(spark, tmp_path_factory.mktemp("http"))
        eng = CrawlEngine(
            spark, site, store_b,
            CrawlSettings(
                n_buckets=4, extract=False, follow_redirects=True,
                politeness=PolitenessConfig(per_host_rate=50, round_seconds=1.0),
            ),
        )
        eng.transport = HttpTransport(srv.base_url)
        eng.run(max_rounds=20)

    a = store_a.read_union("url_seen", store_a.latest_round())
    b = store_b.read_union("url_seen", store_b.latest_round())
    key = lambda df: sorted((r["url"], r["round"], r["seq"], r["status"]) for r in df.collect())
    assert key(a) == key(b)

    da = store_a.read_union("documents", store_a.latest_round())
    db = store_b.read_union("documents", store_b.latest_round())
    span_key = lambda df: sorted(
        (r["doc_id"], r["status"], tuple(map(tuple, r["spans"] or [])))
        for r in df.collect()
    )
    assert span_key(da) == span_key(db)


def test_round_redirect_frontier_plan_is_python_and_shuffle_free(spark):
    """The live redirect arm is one projection over the round parquet:
    no Python eval, no Exchange (merge_frontier's groupBy does the dedup
    downstream, not this operator)."""
    from ba_gepris_crawler_spark.operators.redirects import round_redirect_frontier

    docs = spark.createDataFrame(
        [("https://h.org/gepris/projekt/5", 301,
          [{"kind": "location", "text": "", "media_ref": "/gepris/projekt/6?language=en", "offset": 0}], 1)],
        "url string, status int, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "crawl_depth int",
    )
    out = round_redirect_frontier(docs, next_round=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan
    rows = out.collect()
    assert [r["url"] for r in rows] == ["https://h.org/gepris/projekt/6?language=en"]
    assert rows[0]["resource_type"] == "project" and rows[0]["resource_id"] == "6"
    assert rows[0]["crawl_depth"] == 2


def test_frontier_rows_from_urls_recognizes_forms(spark):
    """The shared URL recognizer: detail and catalog forms parse into
    frontier metadata; foreign URLs drop; Python/shuffle-free plan."""
    from ba_gepris_crawler_spark.operators.frontier import frontier_rows_from_urls

    urls = spark.createDataFrame(
        [
            ("https://h.org/gepris/person/200001?language=en",),
            ("https://h.org/gepris/OCTOPUS?context=projekt&index=0&resourceTypeQuery=projekt",),
            ("https://elsewhere.org/not/gepris",),
            ("relative/not-a-url",),
        ],
        "url string",
    )
    out = frontier_rows_from_urls(urls, next_round=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan, plan
    rows = {r["url"]: r for r in out.collect()}
    assert set(rows) == {
        "https://h.org/gepris/person/200001?language=en",
        "https://h.org/gepris/OCTOPUS?context=projekt&index=0&resourceTypeQuery=projekt",
    }
    det = rows["https://h.org/gepris/person/200001?language=en"]
    assert det["resource_type"] == "person" and det["resource_id"] == "200001"
    cat = rows["https://h.org/gepris/OCTOPUS?context=projekt&index=0&resourceTypeQuery=projekt"]
    assert cat["resource_type"] == "project" and cat["resource_id"] is None
    assert all(r["crawl_depth"] == 0 and r["discovered_round"] == 0 for r in rows.values())
