"""Snapshot store: atomic per-round commits with lineage, parquet-backed.

The sandbox has no Iceberg runtime jars, so this module implements the same
contract over parquet directories + JSON manifests (SURVEY.md §7.4 risk 4):

    <root>/rounds/round=<k>/<table>/...parquet     (data, written first)
    <root>/manifests/round-<k>.json                (commit = atomic rename)

A round is visible iff its manifest exists; manifests are written via
tmp-file + os.replace, so a crash mid-round leaves only orphaned data dirs
that the deterministic re-run overwrites — the mid-round resume contract of
the north rule. Each manifest carries row counts, fetch counters, the bloom
shard version, and per-partition lineage (per host_bucket: fetched /
deferred counts) mirroring the reference's three resume mechanisms (stage
dirs / crawled-id CSVs / count gate — GeprisCrawler.scala:31-38,
CrawlResourceDetailsGraph.scala:20-53, GetAndSaveResourceIdsToCrawlGraph.scala:24-38).

Swapping this for Iceberg = replacing _write/_read with
`df.writeTo(...).createOrReplace()` / snapshot reads; the engine API is
unchanged.

DELTA tables (url_seen, documents, eav, ...) append one directory per
round and are read as a union; STATE tables (frontier) are full rewrites
read at a single round.
"""

from __future__ import annotations

import json
import os
import re
import time
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str | os.PathLike):
        self.spark = spark
        self.root = Path(root)
        (self.root / "manifests").mkdir(parents=True, exist_ok=True)
        (self.root / "rounds").mkdir(parents=True, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _round_dir(self, rnd: int) -> Path:
        return self.root / "rounds" / f"round={rnd:05d}"

    def table_path(self, name: str, rnd: int) -> Path:
        return self._round_dir(rnd) / name

    def manifest_path(self, rnd: int) -> Path:
        return self.root / "manifests" / f"round-{rnd:05d}.json"

    # -- commit --------------------------------------------------------
    def write_table(self, name: str, rnd: int, df: DataFrame) -> int:
        """Write one table of round `rnd`; returns row count. Not visible
        until commit()."""
        path = str(self.table_path(name, rnd))
        # Row count is observed DURING the write action (CollectMetrics node)
        # instead of re-reading the written files — one job per table, not two.
        obs = Observation(f"write-{name}-{rnd}")
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode("overwrite").parquet(path)
        return int(obs.get["n"])

    def commit(self, rnd: int, tables: dict[str, int], counters: dict, lineage: list[dict] | None = None) -> dict:
        manifest = {
            "round": rnd,
            "committed_at": time.time(),
            "tables": tables,
            "counters": counters,
            "lineage": lineage or [],
        }
        tmp = self.manifest_path(rnd).with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=2))
        os.replace(tmp, self.manifest_path(rnd))  # atomic commit point
        return manifest

    # -- crawl config (persisted once at new-crawl; resume must reuse it:
    #    a crawl folder is self-describing, like the reference's crawl dirs) --
    def save_config(self, cfg: dict) -> None:
        tmp = (self.root / "config.json").with_suffix(".json.tmp")
        tmp.write_text(json.dumps(cfg, indent=2))
        os.replace(tmp, self.root / "config.json")

    def load_config(self) -> dict | None:
        p = self.root / "config.json"
        return json.loads(p.read_text()) if p.exists() else None

    # -- read ----------------------------------------------------------
    def committed_rounds(self) -> list[int]:
        out = []
        for p in (self.root / "manifests").glob("round-*.json"):
            m = re.match(r"round-(\d+)\.json$", p.name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def manifest(self, rnd: int) -> dict:
        return json.loads(self.manifest_path(rnd).read_text())

    def read_state(self, name: str, rnd: int) -> DataFrame:
        """Full-state table at round `rnd` (e.g. frontier)."""
        return self.spark.read.parquet(str(self.table_path(name, rnd)))

    def read_union(self, name: str, upto: int) -> DataFrame | None:
        """Delta table union over rounds 0..upto (e.g. url_seen, documents).
        Missing rounds (table not written that round) are skipped."""
        paths = [
            str(self.table_path(name, r))
            for r in self.committed_rounds()
            if r <= upto and r in self._rounds_with(name)
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _rounds_with(self, name: str) -> set[int]:
        return {r for r in self.committed_rounds() if name in self.manifest(r)["tables"]}
