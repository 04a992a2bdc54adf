#!/usr/bin/env python
"""Span-layout parquet encode A/B (VERDICT r3 #3).

The measured end-to-end scaling ceiling is the documents write: nested
`array<struct<kind,text,media_ref,offset>>` spans pay levels/offsets
assembly per element (the round-3 codec A/B was null — the cost is
structure, not compression). This bench times the SAME fetched corpus
written in three layouts:

  struct  — spans array<struct<...>>              (current engine layout)
  packed  — parallel arrays kinds/texts/media_refs/offsets
            (4 independent repeated columns, no struct traversal;
             lossless: arrays_zip reconstructs spans on read)
  json    — one to_json(spans) string column (no nesting at all;
            from_json on read — the fmt='json' fetch path already
            round-trips this exact encoding byte-equal)

Each layout's frame is localCheckpointed BEFORE the timer so only the
parquet encode is measured (the engine would emit the layout straight
off the fetch worker, paying no conversion either). Pass --pair to run
the pinned local-cluster N (1x2) vs 4N (4x2) scaling pair per layout
instead of the single-size ratio.

Run: python BENCH/span_encode_ab.py [n_pages] [--pair]
Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, shutil, sys, tempfile, time
n_pages = int(sys.argv[1])
execs = sys.argv[2]  # "local" or an executor count
from pyspark.sql import functions as F
from ba_gepris_crawler_spark.operators.fetch import fetch_pages
from ba_gepris_crawler_spark.session import get_spark
from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig

if execs == "local":
    spark = get_spark(master="local[16]", shuffle_partitions=32, app_name="span-ab")
else:
    import pyspark
    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    spark = get_spark(
        master=f"local-cluster[{int(execs)},2,6144]", shuffle_partitions=32,
        app_name="span-ab",
        extra_conf={"spark.executorEnv.PYTHONPATH": "/root/repo",
                    "spark.executor.extraJavaOptions": "-XX:ActiveProcessorCount=2"},
    )

site = SiteConfig(
    hosts=tuple(f"h{i:02d}.gepris.example.org" for i in range(16)),
    n_projects=int(n_pages * 0.65), n_persons=int(n_pages * 0.25),
    n_institutions=n_pages - int(n_pages * 0.65) - int(n_pages * 0.25),
    hits_per_page=50, seed=42, page_weight=8,
)
ids = spark.range(n_pages)
frontier = ids.select(
    F.format_string(
        "https://h%02d.gepris.example.org/gepris/projekt/%d?language=en",
        (F.col("id") % 16).cast("int"), (F.lit(100000) + F.col("id") % site.n_projects),
    ).alias("url"),
    F.format_string("h%02d.gepris.example.org", (F.col("id") % 16).cast("int")).alias("host"),
    F.lit(1).cast("int").alias("slot"),
    F.pmod(F.crc32(F.col("url").cast("binary")), F.lit(32)).cast("int").alias("host_bucket"),
)
base = fetch_pages(frontier, site, per_host_rate=float(n_pages), n_buckets=32,
                   span_transport="arrow") \
    .select("url", "status", "spans").localCheckpoint(eager=True)

layouts = {
    "struct": base,
    "packed": base.select(
        "url", "status",
        F.col("spans.kind").alias("kinds"),
        F.col("spans.text").alias("texts"),
        F.col("spans.media_ref").alias("media_refs"),
        F.col("spans.offset").alias("offsets"),
    ).localCheckpoint(eager=True),
    "json": base.select(
        "url", "status", F.to_json("spans").alias("spans_json")
    ).localCheckpoint(eager=True),
}

def du(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total

out = {"n_pages": n_pages, "execs": execs, "layouts": {}}
for name, df in layouts.items():
    runs = []
    for _ in range(2):
        work = tempfile.mkdtemp(prefix=f"span_ab_{name}_")
        try:
            t0 = time.time()
            df.write.mode("overwrite").parquet(work)
            runs.append(time.time() - t0)
            nbytes = du(work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    out["layouts"][name] = {
        "write_sec": round(min(runs), 2), "runs": [round(r, 2) for r in runs],
        "mb_on_disk": round(nbytes / 1e6, 1),
        "pages_per_sec": round(n_pages / min(runs), 0),
    }
print(json.dumps(out))
"""


def run(n_pages: int, execs: str, pin: str | None) -> dict:
    cmd = [sys.executable, "-c", _CHILD, str(n_pages), execs]
    if pin and shutil.which("taskset"):
        cmd = ["taskset", "-c", pin] + cmd
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    return json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--pair"]
    pair = "--pair" in sys.argv
    n_pages = int(args[0]) if args else 60_000
    if not pair:
        print(json.dumps({"metric": "span_encode_ab", **run(n_pages, "local", None)}))
        return
    n = run(n_pages, "1", "0-3")
    n4 = run(n_pages, "4", "0-9")
    eff = {
        name: round(
            n4["layouts"][name]["pages_per_sec"]
            / (4 * n["layouts"][name]["pages_per_sec"]), 2)
        for name in n["layouts"]
    }
    print(json.dumps({
        "metric": "span_encode_ab_pair", "n_pages": n_pages,
        "n": n["layouts"], "n4": n4["layouts"], "scaling_efficiency": eff,
    }))


if __name__ == "__main__":
    main()
