"""Driver-memory flatness microbench for the cuckoo URL-seen gate.

Round-3 verdict: the driver-dict cuckoo regime collects the full hashed
seen set onto the driver (O(|seen|) driver memory — the pattern that
cannot hold at a 10^10-URL frontier). The executor-resident
CuckooShardTable builds shards inside mapInPandas tasks and keeps them as
a localCheckpointed DataFrame, so the driver only ever sees n_shards
metadata rows.

This bench pins that: build the gate at |seen| = N and 10N in BOTH
regimes (each in a fresh subprocess so ru_maxrss is clean) and report the
driver's peak-RSS delta over the pre-build baseline. Expected shape:
driver-regime delta grows ~10x with the seen set; table-regime delta is
flat. A split probe runs after each build so the measured filter is the
real, working gate.

Usage: python BENCH/cuckoo_resident.py [N]   (default N=600_000)
Emits one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys

_CHILD = r"""
import json, resource, sys, time
mode, n = sys.argv[1], int(sys.argv[2])
from pyspark.sql import functions as F
from ba_gepris_crawler_spark.session import get_spark
from ba_gepris_crawler_spark.operators import cuckoo as CK

spark = get_spark(master="local[16]", shuffle_partitions=16, app_name=f"ck-{mode}-{n}")
urls = spark.range(n).select(
    F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url")
)
urls.count()  # warm the scan path before the RSS baseline
base_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
t0 = time.time()
cf = CK.build_cuckoo(urls, expected_items=n, n_shards=16, mode=mode)
build_s = time.time() - t0
t0 = time.time()
probe = spark.range(n // 2, n // 2 + n).select(
    F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url")
)
new, maybe = CK.split_by_cuckoo(probe, cf)
n_new = new.count()
probe_s = time.time() - t0
peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(json.dumps({
    "mode": mode, "n": n,
    "driver_rss_delta_mb": round((peak_kb - base_kb) / 1024, 1),
    "build_sec": round(build_s, 2), "probe_sec": round(probe_s, 2),
    "probe_new": n_new,
}))
"""


def run(mode: str, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, mode, str(n)],
        capture_output=True, text=True, cwd="/root/repo", timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"cuckoo bench child ({mode}, n={n}) failed rc={out.returncode}: "
            + out.stderr[-2000:]
        )
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    cells = [run(m, size) for m in ("driver", "distributed") for size in (n, 10 * n)]
    by = {(c["mode"], c["n"]): c for c in cells}
    drv_growth = by[("driver", 10 * n)]["driver_rss_delta_mb"] / max(
        1.0, by[("driver", n)]["driver_rss_delta_mb"]
    )
    tbl_growth = by[("distributed", 10 * n)]["driver_rss_delta_mb"] / max(
        1.0, by[("distributed", n)]["driver_rss_delta_mb"]
    )
    print(json.dumps({
        "metric": "cuckoo_gate_driver_rss",
        "n_small": n, "n_large": 10 * n,
        "cells": cells,
        "driver_regime_rss_growth_x": round(drv_growth, 2),
        "table_regime_rss_growth_x": round(tbl_growth, 2),
    }))


if __name__ == "__main__":
    main()
