"""Streaming crawl (streaming/crawl_stream.py): the self-feeding frontier
stream must crawl the reachable site to exhaustion and land on the SAME
seen set / documents as the batch engine (micro-batch boundaries are
nondeterministic, so trace equality is out of scope by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig
from ba_gepris_crawler_spark.streaming.crawl_stream import StreamingCrawl


def test_streaming_crawl_matches_batch_seen_set(spark, tmp_path):
    cfg = SiteConfig(
        hosts=("gepris.example.org", "alt1.example.org"),
        n_projects=15, n_persons=8, n_institutions=3,
        hits_per_page=6, seed=5,
        error_mod=11,  # quarantine path must behave identically
    )
    pol = PolitenessConfig(per_host_rate=40, round_seconds=1.0, max_in_flight=5)

    sc = StreamingCrawl(spark, cfg, tmp_path / "stream", politeness=pol, n_buckets=8)
    sc.seed()
    waves = sc.drain(max_waves=20)
    assert 1 < waves <= 20  # discovery actually fed the stream back

    store = SnapshotStore(spark, tmp_path / "batch")
    CrawlEngine(
        spark, cfg, store,
        CrawlSettings(n_buckets=8, politeness=pol, extract=False),
    ).run(max_rounds=30)

    batch_seen = {
        (r.url, r.status)
        for r in store.read_union("url_seen", store.latest_round()).collect()
    }
    stream_seen = {(r.url, r.status) for r in sc.seen().collect()}
    assert stream_seen == batch_seen
    # each url fetched exactly once in the stream too
    n = sc.seen().count()
    assert n == sc.seen().select("url").distinct().count()

    batch_docs = {
        r.doc_id
        for r in store.read_union("documents", store.latest_round())
        .filter(F.col("status") == 200).collect()
    }
    stream_docs = {r.doc_id for r in sc.documents().filter(F.col("status") == 200).collect()}
    assert stream_docs == batch_docs
