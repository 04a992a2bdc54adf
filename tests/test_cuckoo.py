"""Cuckoo-filter URL-seen shards (operators/cuckoo.py) — the north rule's
second admission-gate option. Pinned: the no-false-negative contract, the
measured false-positive rate, DELETION (the capability blooms lack),
incremental insert, split_by_cuckoo's partition of the frontier, and
determinism of the build."""

from __future__ import annotations

import pathlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators.cuckoo import (
    CuckooShard,
    CuckooShardTable,
    build_cuckoo,
    build_cuckoo_table,
    delete_urls,
    insert_urls,
    split_by_cuckoo,
)


def _urls(spark, lo, hi, tag="p"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"https://h/{tag}/"), F.col("id").cast("string")).alias("url")
    )


# ---------------- shard-level (no Spark) ----------------

def _hashes(n, seed=7):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2**63, n).astype(np.uint64),
            rng.integers(0, 2**63, n).astype(np.uint64))


def test_shard_no_false_negatives_and_fpp():
    h1, h2 = _hashes(50_000)
    s = CuckooShard.sized_for(60_000)
    s.insert_many(h1, h2)
    assert bool(s.contains_many(h1, h2).all())  # every inserted key hits
    q1, q2 = _hashes(100_000, seed=99)  # disjoint w.h.p.
    fpp = s.contains_many(q1, q2).mean()
    assert fpp < 0.005, fpp  # expected ~2*4/2^16 = 0.00012


def test_shard_delete_removes_without_collateral():
    h1, h2 = _hashes(10_000)
    s = CuckooShard.sized_for(12_000)
    s.insert_many(h1, h2)
    removed = s.delete_many(h1[:1000], h2[:1000])
    assert removed == 1000
    assert not s.contains_many(h1[:1000], h2[:1000]).any()  # gone
    assert bool(s.contains_many(h1[1000:], h2[1000:]).all())  # others intact


def test_shard_over_capacity_raises():
    h1, h2 = _hashes(5_000)
    s = CuckooShard.sized_for(64)  # tiny table
    with pytest.raises(RuntimeError, match="over capacity"):
        s.insert_many(h1, h2)


# ---------------- distributed build + gate ----------------

@pytest.fixture(scope="module")
def cf(spark):
    return build_cuckoo(_urls(spark, 0, 20_000), expected_items=30_000, n_shards=8)


def test_split_contract(spark, cf):
    frontier = _urls(spark, 10_000, 30_000)  # half seen, half new
    new, maybe = split_by_cuckoo(frontier, cf)
    new_ids = {int(r.url.rsplit("/", 1)[1]) for r in new.collect()}
    maybe_ids = {int(r.url.rsplit("/", 1)[1]) for r in maybe.collect()}
    assert new_ids.isdisjoint(maybe_ids)
    assert new_ids | maybe_ids == set(range(10_000, 30_000))
    # no false negatives: every actually-seen url is in maybe_seen
    assert set(range(10_000, 20_000)) <= maybe_ids
    # the gate is useful: nearly all unseen urls skip the exact join
    fp = len(maybe_ids & set(range(20_000, 30_000)))
    assert fp < 100, fp


def test_incremental_insert(spark, cf):
    insert_urls(cf, _urls(spark, 40_000, 41_000))
    new, maybe = split_by_cuckoo(_urls(spark, 40_000, 41_000), cf)
    assert new.count() == 0 and maybe.count() == 1_000


def test_delete_unsees(spark, cf):
    # quarantine-refetch shape: un-see a bounded set, the gate re-admits it
    gone = _urls(spark, 0, 500)
    assert delete_urls(cf, gone) == 500
    new, _maybe = split_by_cuckoo(gone, cf)
    assert new.count() == 500  # provably-new again -> will be refetched
    # neighbours untouched
    new2, maybe2 = split_by_cuckoo(_urls(spark, 500, 1_000), cf)
    assert new2.count() == 0 and maybe2.count() == 500


def test_build_is_deterministic(spark):
    a = build_cuckoo(_urls(spark, 0, 5_000), expected_items=8_000, n_shards=4)
    b = build_cuckoo(
        _urls(spark, 0, 5_000).repartition(13), expected_items=8_000, n_shards=4
    )
    for sid in range(4):
        assert np.array_equal(a.shards[sid].table, b.shards[sid].table), sid


def test_engine_crawl_with_cuckoo_gate_equals_bloom(spark, tmp_path):
    """seen_filter='cuckoo' must produce the exact same crawl as the bloom
    gate (both are admission-only; the exact anti-join decides) — pinned as
    set equality of (url, seq, round) over the whole crawl, plus resume."""
    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
    from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
    from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
    from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig

    site = SiteConfig(
        hosts=("h00.gepris.example.org", "h01.gepris.example.org"),
        n_projects=150, n_persons=50, n_institutions=12, hits_per_page=50, seed=42,
    )
    seen = {}
    for kind in ("bloom", "cuckoo"):
        store = SnapshotStore(spark, tmp_path / kind)
        settings = CrawlSettings(
            n_buckets=8,
            politeness=PolitenessConfig(per_host_rate=300, round_seconds=1.0, max_in_flight=10),
            extract=False, seen_filter=kind, bloom_expected_items=1 << 14,
        )
        eng = CrawlEngine(spark, site, store, settings)
        ms = eng.run(max_rounds=4)  # stop mid-crawl...
        eng2 = CrawlEngine(spark, site, store, settings)  # ...fresh engine
        eng2.resume(max_rounds=8)  # cuckoo resume = full rebuild path
        df = store.read_union("url_seen", store.latest_round())
        seen[kind] = sorted((r["url"], r["seq"], r["round"]) for r in df.collect())
        if kind == "cuckoo":
            assert any(m["counters"].get("cuckoo") for m in ms), "gate never engaged"
    assert seen["cuckoo"] == seen["bloom"]
    assert len(seen["cuckoo"]) > 150


def test_shard_over_capacity_unwinds_eviction_chain():
    """A caught over-capacity error must leave the table exactly as it was
    before the failing key: every previously-inserted key still hits (no
    false negatives for a caller that keeps using the filter)."""
    h1, h2 = _hashes(100_000)
    s = CuckooShard.sized_for(256)
    inserted = 0
    with pytest.raises(RuntimeError, match="over capacity"):
        for i in range(len(h1)):  # insert one at a time to count successes
            s.insert_many(h1[i : i + 1], h2[i : i + 1])
            inserted += 1
    assert inserted > 200  # the table did fill up meaningfully first
    assert bool(s.contains_many(h1[:inserted], h2[:inserted]).all())
    assert s.n_items == inserted


# ---------------- executor-resident table regime ----------------

def _persistent_rdd_count(spark) -> int:
    n = 0
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next()
        n += 1
    return n


def test_table_regime_bit_identical_to_driver(spark):
    """The two regimes must build the SAME tables — the gate's output is
    then regime-independent by construction."""
    drv = build_cuckoo(_urls(spark, 0, 6_000, tag="t"), expected_items=9_000,
                       n_shards=4, mode="driver")
    tbl = build_cuckoo(_urls(spark, 0, 6_000, tag="t").repartition(11),
                       expected_items=9_000, n_shards=4, mode="distributed")
    assert isinstance(tbl, CuckooShardTable)
    rows = {r["shard"]: r for r in tbl.df.collect()}
    for sid in range(4):
        assert np.array_equal(
            np.frombuffer(rows[sid]["table"], dtype=np.uint16).reshape(-1, 4),
            drv.shards[sid].table,
        ), sid
    assert tbl.n_items == drv.n_items
    tbl.free()


@pytest.fixture(scope="module")
def ct(spark):
    return build_cuckoo_table(
        _urls(spark, 0, 20_000), expected_items=30_000, n_shards=8
    )


def test_table_split_contract(spark, ct):
    frontier = _urls(spark, 10_000, 30_000)
    new, maybe = split_by_cuckoo(frontier, ct)
    new_ids = {int(r.url.rsplit("/", 1)[1]) for r in new.collect()}
    maybe_ids = {int(r.url.rsplit("/", 1)[1]) for r in maybe.collect()}
    assert new_ids.isdisjoint(maybe_ids)
    assert new_ids | maybe_ids == set(range(10_000, 30_000))
    assert set(range(10_000, 20_000)) <= maybe_ids  # no false negatives
    assert len(maybe_ids & set(range(20_000, 30_000))) < 100


def test_table_insert_delete_and_block_hygiene(spark, ct):
    """Insert/delete swap in a new checkpointed version and FREE the old
    blocks — the live persisted-RDD count must not grow with versions."""
    base = _persistent_rdd_count(spark)
    insert_urls(ct, _urls(spark, 40_000, 41_000))
    insert_urls(ct, _urls(spark, 41_000, 42_000))
    removed = delete_urls(ct, _urls(spark, 0, 500))
    assert removed == 500
    assert _persistent_rdd_count(spark) == base  # old versions freed
    new, maybe = split_by_cuckoo(_urls(spark, 40_000, 42_000), ct)
    assert new.count() == 0 and maybe.count() == 2_000
    gone_new, _ = split_by_cuckoo(_urls(spark, 0, 500), ct)
    assert gone_new.count() == 500  # un-seen again
    ok_new, ok_maybe = split_by_cuckoo(_urls(spark, 500, 1_000), ct)
    assert ok_new.count() == 0 and ok_maybe.count() == 500  # no collateral


def test_table_non_power_of_two_shards(spark):
    ct10 = build_cuckoo_table(
        _urls(spark, 0, 8_000, tag="tnp"), expected_items=12_000, n_shards=10
    )
    new, maybe = split_by_cuckoo(_urls(spark, 0, 8_000, tag="tnp"), ct10)
    assert new.count() == 0
    assert maybe.count() == 8_000
    ct10.free()


def test_engine_crawl_with_distributed_cuckoo_equals_bloom(spark, tmp_path):
    """cuckoo_mode='distributed' must produce the exact same crawl as the
    bloom gate, including across a mid-crawl resume (rebuild path)."""
    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
    from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
    from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
    from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig

    site = SiteConfig(
        hosts=("h00.gepris.example.org", "h01.gepris.example.org"),
        n_projects=120, n_persons=40, n_institutions=10, hits_per_page=50, seed=42,
    )
    seen = {}
    for kind, mode in (("bloom", "auto"), ("cuckoo", "distributed")):
        store = SnapshotStore(spark, tmp_path / f"{kind}-{mode}")
        settings = CrawlSettings(
            n_buckets=8,
            politeness=PolitenessConfig(per_host_rate=300, round_seconds=1.0, max_in_flight=10),
            extract=False, seen_filter=kind, bloom_expected_items=1 << 14,
            cuckoo_mode=mode,
        )
        eng = CrawlEngine(spark, site, store, settings)
        ms = eng.run(max_rounds=3)
        eng2 = CrawlEngine(spark, site, store, settings)
        eng2.resume(max_rounds=6)
        df = store.read_union("url_seen", store.latest_round())
        seen[kind] = sorted((r["url"], r["seq"], r["round"]) for r in df.collect())
        if kind == "cuckoo":
            assert any(m["counters"].get("cuckoo") for m in ms), "gate never engaged"
    assert seen["cuckoo"] == seen["bloom"]
    assert len(seen["cuckoo"]) > 120


def test_resume_loads_persisted_shard_table(spark, tmp_path, monkeypatch):
    """A resumed engine must LOAD the persisted cuckoo shard table (plus
    the gap delta) instead of rebuilding from the full seen union — the
    cuckoo analog of the persisted bloom bitmap. Pinned by poisoning the
    rebuild path on the resumed engine."""
    from ba_gepris_crawler_spark.operators import cuckoo as CK
    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
    from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
    from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
    from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig

    site = SiteConfig(
        hosts=("h00.gepris.example.org",), n_projects=120, n_persons=40,
        n_institutions=10, hits_per_page=50, seed=42,
    )
    store = SnapshotStore(spark, tmp_path / "c")
    settings = CrawlSettings(
        n_buckets=8,
        politeness=PolitenessConfig(per_host_rate=60, round_seconds=1.0, max_in_flight=10),
        extract=False, seen_filter="cuckoo", bloom_expected_items=1 << 14,
        cuckoo_mode="distributed",
    )
    CrawlEngine(spark, site, store, settings).run(max_rounds=3)
    assert (tmp_path / "c" / "cuckoo" / "latest.json").exists()

    def boom(*a, **kw):  # a resume that rebuilds would call this
        raise AssertionError("resume rebuilt the cuckoo table instead of loading it")

    monkeypatch.setattr(CK, "build_cuckoo_table", boom)
    monkeypatch.setattr(CK, "build_cuckoo", boom)
    eng2 = CrawlEngine(spark, site, store, settings)
    ms = eng2.resume(max_rounds=4)
    assert ms and any(m["counters"].get("cuckoo") for m in ms)
    assert eng2._cuckoo is not None and hasattr(eng2._cuckoo, "df")


def test_non_power_of_two_shards_no_false_negatives(spark):
    """Regression: lookup routing must use the same signed floor-mod as the
    build side's pmod — with n_shards=10 roughly half of all xxhash64
    values are negative, and a uint64 modulo would probe the wrong shard."""
    cf10 = build_cuckoo(_urls(spark, 0, 8_000, tag="npot"), expected_items=12_000, n_shards=10)
    new, maybe = split_by_cuckoo(_urls(spark, 0, 8_000, tag="npot"), cf10)
    assert new.count() == 0  # every seen url must hit (no false negatives)
    assert maybe.count() == 8_000


def test_table_ops_do_not_free_caller_caches(spark):
    """Regression (r4 review): _swap identified its checkpoint by a bare
    before/after diff of getPersistentRDDs(), so when the eager checkpoint
    job was the FIRST to materialize an unrelated caller cache (the
    engine's seen.cache()), that cache's RDD landed in _rdd_ids and the
    next insert/delete/free silently unpersisted blocks the table does
    not own."""
    from ba_gepris_crawler_spark.operators.cuckoo import _persisted_ids

    before = _persisted_ids(spark)
    urls = _urls(spark, 0, 5_000, tag="own").cache()  # NOT yet materialized
    ct = build_cuckoo_table(urls, expected_items=8_000, n_shards=4)
    # the build job was the first to materialize urls' cache
    cache_ids = {i for i in _persisted_ids(spark) - before if i not in (ct._rdd_ids or set())}
    assert cache_ids, "expected the build to materialize the caller cache"
    insert_urls(ct, _urls(spark, 5_000, 5_100, tag="own"))
    delete_urls(ct, _urls(spark, 0, 50, tag="own"))
    ct.free()
    assert cache_ids <= _persisted_ids(spark), "table ops freed a caller cache"
    urls.unpersist()


def test_save_cuckoo_same_round_never_overwrites_live_dir(spark, tmp_path):
    """Regression (r4 review): a rewound crawl (--from-round) re-saves the
    same round tag; writing in place would delete the very dir latest.json
    points at mid-write. Each save must land in a fresh generation dir,
    and a torn dir (no _SUCCESS) must read as absent, not crash resume."""
    from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore

    store = SnapshotStore(spark, tmp_path / "s")
    ct = build_cuckoo_table(_urls(spark, 0, 1_000, tag="sv"), expected_items=2_000, n_shards=4)
    meta = {"n_shards": ct.n_shards, "per_shard": ct.per_shard,
            "n_items": ct.n_items, "version": ct.version}
    store.save_cuckoo(3, ct.df, meta)
    p1, _ = store.load_cuckoo(3)
    store.save_cuckoo(3, ct.df, meta)  # rewind re-save, same tag
    p2, m2 = store.load_cuckoo(3)
    assert p1 != p2, "re-save overwrote the live snapshot dir in place"
    assert spark.read.parquet(p2).count() == ct.df.count()
    assert m2["n_shards"] == ct.n_shards
    ct.free()
    (pathlib.Path(p2) / "_SUCCESS").unlink()  # simulate a torn write
    assert store.load_cuckoo(3) is None


def test_auto_shards_sizing():
    """n_shards=None auto-sizes so one shard's table stays <= 32 MiB: the
    sandbox scale keeps 16 shards; the 10^10-URL regime the docstring
    targets gets ~2^10 shards (~20 MB each) instead of 16 x ~1 GB Arrow
    cells."""
    from ba_gepris_crawler_spark.operators.cuckoo import _SLOTS, _shard_m, auto_shards

    assert auto_shards(1 << 17) == 16
    n = auto_shards(10**10)
    assert n >= 1024
    assert _shard_m(max(64, 10**10 // n)) * _SLOTS * 2 <= 32 << 20


def test_resume_with_driver_mode_ignores_persisted_table(spark, tmp_path):
    """cuckoo_mode='driver' forces the collected-dict regime by contract;
    a persisted shard table on disk (from an earlier distributed crawl)
    must not override the explicit mode on resume."""
    from ba_gepris_crawler_spark.operators.cuckoo import CuckooFilterShards
    from ba_gepris_crawler_spark.operators.politeness import PolitenessConfig
    from ba_gepris_crawler_spark.plans.checkpoint import SnapshotStore
    from ba_gepris_crawler_spark.plans.round_loop import CrawlEngine, CrawlSettings
    from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig

    site = SiteConfig(
        hosts=("h00.gepris.example.org",), n_projects=120, n_persons=40,
        n_institutions=10, hits_per_page=50, seed=42,
    )
    store = SnapshotStore(spark, tmp_path / "c")
    settings = CrawlSettings(
        n_buckets=8,
        politeness=PolitenessConfig(per_host_rate=60, round_seconds=1.0, max_in_flight=10),
        extract=False, seen_filter="cuckoo", bloom_expected_items=1 << 14,
        cuckoo_mode="distributed",
    )
    CrawlEngine(spark, site, store, settings).run(max_rounds=3)
    assert (tmp_path / "c" / "cuckoo" / "latest.json").exists()
    from dataclasses import replace

    eng2 = CrawlEngine(spark, site, store, replace(settings, cuckoo_mode="driver"))
    ms = eng2.resume(max_rounds=4)
    assert ms and any(m["counters"].get("cuckoo") for m in ms)
    assert isinstance(eng2._cuckoo, CuckooFilterShards), "on-disk table overrode cuckoo_mode='driver'"


def test_portable_gate_no_false_negatives_and_structure(spark):
    """portable_cuckoo_gate (the oracle-replayable twin): every seen URL is
    flagged member (no false negatives — the gate contract both numpy
    regimes guarantee), non-members are provably unseen, and the placement
    columns obey the partial-key identity i2 = i1 XOR (H(fp) % m)."""
    from ba_gepris_crawler_spark.operators.cuckoo import portable_cuckoo_gate

    urls = spark.range(600).select(
        F.concat(F.lit("https://h"), (F.col("id") % 5).cast("string"),
                 F.lit(".example.org/p/"), F.col("id").cast("string")).alias("url"),
        "id",
    )
    seen = urls.filter(F.col("id") % 3 == 0).select("url")
    out = portable_cuckoo_gate(urls.select("url"), seen, m=1024)
    rows = {r.url: r for r in out.collect()}
    seen_urls = {r.url for r in seen.collect()}
    # no false negatives: every member of the seen set is gated 'skip'
    assert all(rows[u].member and rows[u].action == "skip" for u in seen_urls)
    # a 'fetch' decision is PROVABLY unseen
    assert all(u not in seen_urls for u, r in rows.items() if r.action == "fetch")
    # and the admit side is non-trivial (gate not degenerate)
    assert sum(1 for r in rows.values() if not r.member) > 100
    # structure: i2 = i1 ^ (H(fp) % m), all buckets < m, fp nonzero 16-bit
    for r in rows.values():
        assert 1 <= r.fp <= 65535 and 0 <= r.i1 < 1024 and 0 <= r.i2 < 1024


def test_delete_duplicate_gone_rows_remove_one_copy_per_key(spark):
    """`gone` can carry the same URL twice (quarantined via two discovery
    paths): each extra row used to remove one MORE fingerprint copy, and
    past the key's own copies the theft hits a DIFFERENT url colliding on
    (bucket, fp) — a false negative the gate contract forbids (review r5
    store #3). Deletes must remove at most ONE copy per distinct key, in
    both regimes; the surviving duplicate copy is a safe false positive."""
    for mode in ("driver", "table"):
        cf = build_cuckoo(_urls(spark, 0, 1_000, tag=f"dd{mode}"),
                          expected_items=4_000, n_shards=4, mode=mode)
        # insert url 0..100 a SECOND time (duplicate copies are kept by
        # design — see insert_many's delete-safety NOTE)
        insert_urls(cf, _urls(spark, 0, 100, tag=f"dd{mode}"))
        n_before = cf.n_items
        dup_gone = _urls(spark, 0, 100, tag=f"dd{mode}").unionAll(
            _urls(spark, 0, 100, tag=f"dd{mode}")
        )
        removed = delete_urls(cf, dup_gone)
        assert removed == 100, (mode, removed)  # one per DISTINCT key
        assert cf.n_items == n_before - 100, mode
        # the second stored copy survives: still (safely) maybe-seen
        _new, maybe = split_by_cuckoo(_urls(spark, 0, 100, tag=f"dd{mode}"), cf)
        assert maybe.count() == 100, mode
