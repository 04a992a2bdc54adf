"""Partitioned cuckoo-filter URL-seen shards — the north rule's second
admission-gate option ("bloom/cuckoo URL-seen filter") alongside
operators/url_seen.py's bloom.

Why cuckoo (Fan, Andersen, Kaminsky, Mitzenmacher: "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT'14 — public algorithm): DELETION.
A bloom bit can never be unset, so un-seeing a URL (re-fetch after a
quarantined error, an operator-forced recrawl) means a full rebuild. A
cuckoo filter removes one fingerprint in O(1), so the engine can forget a
bounded error set between rounds. Same contract as the bloom otherwise:
no false negatives (a miss is PROVABLY unseen and skips the exact join),
false positives only cost a pass through the exact-seen anti-join.

Sharding: URLs route to shard `pmod(xxhash64(url), n_shards)` — the same
hash family every other URL-keyed layout in this engine uses — and each
shard is an independent filter over its key range. Unlike bloom bitmaps,
cuckoo tables cannot be OR-merged, so the shards NEVER merge: at 10^10
URLs they live executor-resident, co-partitioned with the frontier, and
membership tests run shard-local (the sandbox keeps the dict
driver/broadcast-resident — same read contract, fewer executors).

Structure: m buckets (power of two) x 4 slots of 16-bit fingerprints;
i2 = i1 XOR H(fp) (partial-key cuckooing), <= 500 evictions per insert.
Expected false-positive rate ~ 2*b/2^f = 8/65536 ~ 0.012%.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SLOTS = 4
_MAX_KICKS = 500
_FP_SALT = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment (public)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain) — derives the fp-placement
    hash from the fingerprint so i2 = i1 ^ H(fp) is well spread."""
    z = h.astype(np.uint64, copy=True)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _fingerprint(h2: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint (0 marks an empty slot)."""
    fp = (h2.astype(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


@dataclass
class CuckooShard:
    table: np.ndarray  # (m, _SLOTS) uint16
    m: int
    n_items: int = 0

    @classmethod
    def sized_for(cls, expected_items: int) -> "CuckooShard":
        # 4 slots/bucket at <=95% load: m = next power of two covering
        # expected/(4*0.95)
        need = max(8, int(expected_items / (_SLOTS * 0.95)) + 1)
        m = 1 << (need - 1).bit_length()
        return cls(table=np.zeros((m, _SLOTS), dtype=np.uint16), m=m)

    # -- positions -----------------------------------------------------
    def _i1(self, h1: np.ndarray) -> np.ndarray:
        # mix BEFORE bucketing: shard routing is h1 % n_shards, so raw
        # h1 % m (both powers-of-two-aligned) would confine a shard's keys
        # to 1/n_shards of its own buckets and overflow at ~1/n_shards load
        return (_mix(h1) % np.uint64(self.m)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i1 ^ (_mix(fp.astype(np.uint64)) % np.uint64(self.m)).astype(np.int64)) % self.m

    # -- ops -----------------------------------------------------------
    def insert_many(self, h1: np.ndarray, h2: np.ndarray) -> None:
        fp_arr = _fingerprint(h2)
        i1_arr = self._i1(h1.astype(np.uint64))
        i2_arr = self._i2(i1_arr, fp_arr)
        t = self.table
        for fp, i1, i2 in zip(fp_arr, i1_arr, i2_arr):
            # NOTE: duplicate (bucket, fp) copies are stored, per Fan et al.
            # §3 — deduping on insert would make delete_many of one key
            # un-see a colliding OTHER key (a false negative, breaking the
            # gate contract). Callers must not re-insert the same key set
            # (the engine tracks the delta high-water mark).
            placed = False
            for i in (i1, i2):
                empt = np.flatnonzero(t[i] == 0)
                if empt.size:
                    t[i, empt[0]] = fp
                    placed = True
                    break
            if placed:
                self.n_items += 1
                continue
            # evict loop (partial-key cuckooing); slot rotation is
            # deterministic — resume must rebuild identical tables
            i, cur = int(i2), np.uint16(fp)
            for kick in range(_MAX_KICKS):
                slot = kick % _SLOTS
                cur, t[i, slot] = t[i, slot], cur
                i = int((i ^ (int(_mix(np.array([cur], dtype=np.uint64))[0]) % self.m)) % self.m)
                empt = np.flatnonzero(t[i] == 0)
                if empt.size:
                    t[i, empt[0]] = cur
                    cur = None
                    break
            if cur is not None:
                raise RuntimeError(
                    f"cuckoo shard over capacity ({self.n_items}/{self.m * _SLOTS}); "
                    "size shards with expected_items headroom"
                )
            self.n_items += 1

    def contains_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Vectorized membership: fp present in bucket i1 or i2."""
        fp = _fingerprint(h2)
        i1 = self._i1(h1.astype(np.uint64))
        i2 = self._i2(i1, fp)
        f = fp[:, None]
        return ((self.table[i1] == f).any(axis=1)) | ((self.table[i2] == f).any(axis=1))

    def delete_many(self, h1: np.ndarray, h2: np.ndarray) -> int:
        """Remove one fingerprint copy per present key; returns #removed.
        (The bloom cannot do this at all — it rebuilds.)"""
        fp_arr = _fingerprint(h2)
        i1_arr = self._i1(h1.astype(np.uint64))
        i2_arr = self._i2(i1_arr, fp_arr)
        removed = 0
        t = self.table
        for fp, i1, i2 in zip(fp_arr, i1_arr, i2_arr):
            for i in (i1, i2):
                hit = np.flatnonzero(t[i] == fp)
                if hit.size:
                    t[i, hit[0]] = 0
                    removed += 1
                    self.n_items -= 1
                    break
        return removed


@dataclass
class CuckooFilterShards:
    shards: dict[int, CuckooShard]
    n_shards: int
    version: int = 0

    @property
    def n_items(self) -> int:
        return sum(s.n_items for s in self.shards.values())

    @property
    def capacity(self) -> int:
        return sum(s.m * _SLOTS for s in self.shards.values())

    @property
    def load(self) -> float:
        return self.n_items / max(1, self.capacity)


def _hash_cols(df: DataFrame, url_col: str) -> DataFrame:
    # identical hash family to url_seen.py's bloom: xxhash64(url) and a
    # salted second hash for the fingerprint
    return df.select(
        F.xxhash64(F.col(url_col)).alias("_h1"),
        F.xxhash64(F.concat(F.col(url_col), F.lit("\x01cuckoo"))).alias("_h2"),
    )


def build_cuckoo(
    df: DataFrame,
    url_col: str = "url",
    expected_items: int = 1 << 17,
    n_shards: int = 16,
    version: int = 0,
) -> CuckooFilterShards:
    """Build per-shard tables: one Arrow-batched pass emits (shard, h1, h2)
    grouped rows; inserts run shard-local. The sandbox collects the shard
    dict on the driver (bounded: m*4*2 bytes per shard); the 10^10 regime
    keeps each shard executor-resident next to its frontier partition."""
    per_shard = max(64, expected_items // n_shards)
    hashed = _hash_cols(df, url_col).withColumn(
        "_shard", F.pmod(F.col("_h1"), F.lit(n_shards)).cast("int")
    )

    def build_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, list[pd.DataFrame]] = {}
        for pdf in batches:
            for sid, grp in pdf.groupby("_shard"):
                acc.setdefault(int(sid), []).append(grp)
        out = []
        for sid, grps in acc.items():
            # canonical insert order: table layout depends on it, and a
            # resume rebuild must produce bit-identical shards no matter
            # how the scan partitioned the rows
            g = pd.concat(grps).sort_values(["_h1", "_h2"])
            out.append({"shard": sid,
                        "h1": g["_h1"].to_numpy(dtype=np.int64).tobytes(),
                        "h2": g["_h2"].to_numpy(dtype=np.int64).tobytes()})
        yield pd.DataFrame(out, columns=["shard", "h1", "h2"])

    shards = {i: CuckooShard.sized_for(per_shard) for i in range(n_shards)}
    rows = (
        hashed.repartition(n_shards, "_shard")
        .mapInPandas(build_part, schema="shard int, h1 binary, h2 binary")
        .collect()
    )
    for r in rows:
        h1 = np.frombuffer(r["h1"], dtype=np.int64).astype(np.uint64)
        h2 = np.frombuffer(r["h2"], dtype=np.int64).astype(np.uint64)
        shards[r["shard"]].insert_many(h1, h2)
    return CuckooFilterShards(shards=shards, n_shards=n_shards, version=version)


def insert_urls(cf: CuckooFilterShards, delta: DataFrame, url_col: str = "url") -> CuckooFilterShards:
    """Incremental maintenance: route the delta's hashes to their shards
    and insert — the cuckoo analog of url_seen.update_bloom (no rebuild)."""
    rows = (
        _hash_cols(delta, url_col)
        .withColumn("_shard", F.pmod(F.col("_h1"), F.lit(cf.n_shards)).cast("int"))
        .collect()
    )
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_shard.setdefault(r["_shard"], []).append((r["_h1"], r["_h2"]))
    for sid, hs in by_shard.items():
        a = np.array(sorted(hs), dtype=np.int64).astype(np.uint64)
        cf.shards[sid].insert_many(a[:, 0], a[:, 1])
    cf.version += 1
    return cf


def delete_urls(cf: CuckooFilterShards, gone: DataFrame, url_col: str = "url") -> int:
    """Un-see a bounded URL set (e.g. quarantined errors marked for
    refetch) — the operation blooms cannot express. Returns #removed."""
    rows = (
        _hash_cols(gone, url_col)
        .withColumn("_shard", F.pmod(F.col("_h1"), F.lit(cf.n_shards)).cast("int"))
        .collect()
    )
    removed = 0
    for r in rows:
        a1 = np.array([r["_h1"]], dtype=np.int64).astype(np.uint64)
        a2 = np.array([r["_h2"]], dtype=np.int64).astype(np.uint64)
        removed += cf.shards[r["_shard"]].delete_many(a1, a2)
    cf.version += 1
    return removed


def split_by_cuckoo(
    frontier: DataFrame, cf: CuckooFilterShards, url_col: str = "url"
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) — the same admission-gate contract as
    url_seen.split_by_bloom: negatives are PROVABLY unseen (no false
    negatives) and skip the exact join; positives go through it."""
    spark = frontier.sparkSession
    payload = {
        sid: (s.table.tobytes(), s.m) for sid, s in cf.shards.items()
    }
    bc = spark.sparkContext.broadcast((payload, cf.n_shards))

    hashed = frontier.withColumn("_h1", F.xxhash64(F.col(url_col))).withColumn(
        "_h2", F.xxhash64(F.concat(F.col(url_col), F.lit("\x01cuckoo")))
    )
    in_schema = hashed.schema
    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema.fields)

    def test(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payload, n_shards = bc.value
        shards = {
            sid: CuckooShard(
                table=np.frombuffer(tb, dtype=np.uint16).reshape(m, _SLOTS), m=m
            )
            for sid, (tb, m) in payload.items()
        }
        for pdf in batches:
            h1s = pdf["_h1"].to_numpy(dtype=np.int64)
            h1 = h1s.astype(np.uint64)
            h2 = pdf["_h2"].to_numpy(dtype=np.int64).astype(np.uint64)
            # route with SIGNED floor-mod — numpy's int64 % matches Spark's
            # pmod for positive divisors; routing via uint64 % would
            # disagree with the build side on negative hashes whenever
            # n_shards is not a power of two (false negatives)
            sid = np.mod(h1s, n_shards)
            hit = np.zeros(len(pdf), dtype=bool)
            for s in np.unique(sid):
                mask = sid == s
                hit[mask] = shards[int(s)].contains_many(h1[mask], h2[mask])
            yield pdf.assign(_maybe_seen=hit)

    tested = hashed.mapInPandas(test, schema=f"{out_fields}, _maybe_seen boolean")
    cols = frontier.columns
    return (
        tested.filter(~F.col("_maybe_seen")).select(*cols),
        tested.filter(F.col("_maybe_seen")).select(*cols),
    )
