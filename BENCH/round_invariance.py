#!/usr/bin/env python
"""Round-count invariance bench (VERDICT r2 #6): crawl the same site for
~100 rounds with and without auto-compaction and report per-round wall
time + read-path file counts. Without compaction every round adds one
url_seen/documents delta dir, so the seen-union read grows O(rounds);
with compact_every=K the read path is bounded (compacted base + <=K tail
dirs for url_seen; immutable tiers + <=K tail dirs for documents).

Run:  python BENCH/round_invariance.py [compact_every] [n_hosts] [budget]
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def crawl(compact_every: int, n_hosts: int, budget: int, max_rounds: int) -> dict:
    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
    from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
    from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
    from ba_gepris_crawler_spark.session import get_spark
    from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig

    spark = get_spark(master="local[8]", shuffle_partitions=16, app_name="round-invariance")
    # sized so budget * hosts per round drains the site in ~max_rounds
    n_proj = int(budget * n_hosts * max_rounds * 0.62)
    site = SiteConfig(
        hosts=tuple(f"h{i:02d}.gepris.example.org" for i in range(n_hosts)),
        n_projects=n_proj,
        n_persons=int(n_proj * 0.4),
        n_institutions=int(n_proj * 0.1),
        hits_per_page=50,
        seed=42,
    )
    work = tempfile.mkdtemp(prefix=f"bench_rounds_k{compact_every}_")
    per_round: list[float] = []
    try:
        store = SnapshotStore(spark, work)
        settings = CrawlSettings(
            n_buckets=16,
            politeness=PolitenessConfig(
                per_host_rate=budget, round_seconds=1.0, max_in_flight=10
            ),
            extract=False,
            compact_every=compact_every,
        )
        engine = CrawlEngine(spark, site, store, settings)
        for rnd in range(max_rounds):
            t0 = time.time()
            m = engine.run_round(rnd)
            per_round.append(round(time.time() - t0, 3))
            if m["counters"].get("done"):
                break
        # read-path shape at the end: how many parquet files does a full
        # url_seen / documents union touch?
        from pyspark.sql import functions as F

        def n_read_files(name: str) -> int:
            df = store.read_union(name, store.latest_round())
            if df is None:
                return 0
            return df.select(F.input_file_name()).distinct().count()

        files = {
            "url_seen": n_read_files("url_seen"),
            "documents": n_read_files("documents"),
        }
        n = len(per_round)

        def avg(xs: list[float]) -> float | None:
            return round(sum(xs) / len(xs), 3) if xs else None

        res = {
            "compact_every": compact_every,
            "rounds": n,
            "first10_avg": avg(per_round[2:12]),
            "mid_avg": avg(per_round[max(0, n // 2 - 5): n // 2 + 5]),
            "last10_avg": avg(per_round[-11:-1]),
            "total_sec": round(sum(per_round), 1),
            "read_files": files,
            "per_round": per_round,
        }
        return res
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    ks = [int(sys.argv[1])] if len(sys.argv) > 1 else [0, 8]
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    max_rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 105
    for k in ks:
        r = crawl(k, n_hosts, budget, max_rounds)
        pr = r.pop("per_round")
        print(json.dumps(r))
        print("  per-round:", " ".join(f"{x:.1f}" for x in pr))
