#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>, ...extras}

Two workloads:
1. crawl_bench — the headline BASELINE.json metric: sustained crawl
   throughput (pages/sec) + frontier-dedup rate, on a deterministic
   bench-tier synthetic site (~45k pages across 16 hosts) crawled by the
   full engine (frontier anti-join + bloom gate + politeness + Arrow fetch
   + snapshot commits). Extraction runs as its own timed entry.
2. headline driver queries at $SPARK_GRAFT_SF_DIR (default sf0.1),
   each timed to completion via a noop write.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_PAGES (approx page count for the crawl bench, default
45000; the two-parallelism scaling run uses the same value at local[8] and
local[32] — see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    approx_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "45000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from ba_gepris_crawler_spark.functions import extraction as X
    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
    from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
    from ba_gepris_crawler_spark.plans.driver_queries import REGISTRY
    from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
    from ba_gepris_crawler_spark.session import get_spark
    from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8), app_name="bench")

    queries: dict[str, float] = {}
    extras: dict[str, object] = {"cpus": cpus}

    # ---------------- 1. crawl bench ----------------
    n_projects = int(approx_pages * 30 / 46)
    site = SiteConfig(
        hosts=tuple(f"h{i:02d}.gepris.example.org" for i in range(16)),
        n_projects=n_projects,
        n_persons=int(n_projects * 0.4),
        n_institutions=int(n_projects * 0.1),
        hits_per_page=50,
        seed=42,
        page_weight=int(os.environ.get("SPARK_GRAFT_PAGE_WEIGHT", "8")),
    )
    work = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        store = SnapshotStore(spark, work)
        settings = CrawlSettings(
            n_buckets=max(cpus, 8),
            politeness=PolitenessConfig(per_host_rate=8000, round_seconds=1.0, max_in_flight=10),
            bloom_fpp=0.01,
            use_bloom=True,
            extract=False,
        )
        t0 = time.time()
        manifests = CrawlEngine(spark, site, store, settings).run(max_rounds=12)
        crawl_sec = time.time() - t0
        fetched = sum(m["counters"].get("fetched", 0) for m in manifests)
        discovered = sum(m["counters"].get("discovered_raw", 0) for m in manifests)
        queries["crawl_pages"] = round(crawl_sec, 3)
        extras["crawl_pages_fetched"] = fetched
        extras["crawl_pages_per_sec"] = round(fetched / crawl_sec, 1)
        extras["crawl_rounds"] = len(manifests)
        extras["frontier_dedup_rate"] = round(1.0 - fetched / max(discovered, 1), 4)

        # extraction throughput over the crawled corpus (stage-2 analog)
        docs = store.read_union("documents", store.latest_round())
        t0 = time.time()
        d = X.with_fields(docs.filter("resource_id is not null")).persist()
        for out in (X.eav(d), X.projects(d), X.persons(d), X.institutions(d)):
            out.write.format("noop").mode("overwrite").save()
        extract_sec = time.time() - t0
        d.unpersist()
        queries["extract_typed_eav"] = round(extract_sec, 3)
        extras["extract_pages_per_sec"] = round(fetched / extract_sec, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # ---------------- 2. headline driver queries ----------------
    bench_queries = [
        "crawl_frontier_anti_join",
        "crawl_funding_term_cascade",
        "tpch_q1_pricing_summary",
        "tpch_q3_top10_revenue",
        "tpch_top_customers_per_nation",
        "dedup_exact",
        "dedup_minhash_lsh",
        "emb_cosine_topk",
        "text_quality_score",
        "events_sessionize",
    ]
    for name in bench_queries:
        fn, _ = REGISTRY[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "crawl_pages_per_sec+query_suite",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
