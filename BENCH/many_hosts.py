#!/usr/bin/env python
"""Many-host scheduler microbench (VERDICT r2 #2 follow-through): the old
scheduler collected O(hosts x depths x priorities x buckets) offset rows to
the driver per round; the cumsum scheduler computes them as window
aggregates over the metadata-sized counts frame and broadcast-joins. This
drives schedule_round + the budget cut at 10^5-10^6 DISTINCT HOSTS and
reports wall time plus the driver-collected row count (which must stay at
exactly ZERO — scheduling is lazy; only the engine's <=B bucket-lineage
rows ever reach the driver).

Run: python BENCH/many_hosts.py [n_urls] [n_hosts] ...
Prints one JSON line per (n_urls, n_hosts) config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n_urls: int, n_hosts: int) -> dict:
    from pyspark.sql import functions as F

    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig, schedule_round
    from ba_gepris_crawler_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=32, app_name="many-hosts")
    frontier = spark.range(n_urls).select(
        F.concat(F.lit("https://h"), (F.col("id") % n_hosts).cast("string"),
                 F.lit(".example.org/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % n_hosts).cast("string"), F.lit(".example.org")).alias("host"),
        F.lit("project").alias("resource_type"),
        F.col("id").cast("string").alias("resource_id"),
        (F.col("id") % 3).cast("int").alias("crawl_depth"),
        (F.col("id") % 2).cast("int").alias("priority"),
        F.lit(0).cast("int").alias("discovered_round"),
    ).localCheckpoint(eager=True)  # isolate scheduling cost from generation

    cfg = PolitenessConfig(per_host_rate=5.0, round_seconds=1.0, max_in_flight=10)
    t0 = time.time()
    # many_hosts=True: the size-aware offsets join runs as a co-keyed
    # shuffle instead of a multi-million-row driver broadcast (the engine
    # flips this automatically above MANY_HOSTS_THRESHOLD configured hosts)
    fetch_now, deferred = schedule_round(frontier, cfg, n_buckets=32, many_hosts=True)
    n_now = fetch_now.count()
    n_def = deferred.count()
    sec = time.time() - t0
    # size of the offsets relation the old design would have .collect()ed
    # to the driver every round (and which must NOT be force-broadcast
    # either — AQE decides broadcast vs co-keyed shuffle join by size)
    n_off = (
        frontier.select("host", "crawl_depth", "priority",
                        (F.crc32(F.col("url").cast("binary")) % 32).alias("b"))
        .dropDuplicates(["host", "crawl_depth", "priority", "b"]).count()
    )
    out = {
        "n_urls": n_urls, "n_hosts": n_hosts, "budget": cfg.per_host_budget,
        "fetch_now": n_now, "deferred": n_def,
        "sec": round(sec, 2), "urls_per_sec": round(n_urls / sec),
        "offset_relation_rows": n_off,
    }
    spark.catalog.clearCache()
    return out


if __name__ == "__main__":
    configs = [(2_000_000, 100_000), (2_000_000, 1_000_000), (4_000_000, 400_000)]
    for n_urls, n_hosts in configs:
        print(json.dumps(run(n_urls, n_hosts)))
