"""Hypothesis property tests for the cuckoo-shard kernel (pure numpy —
no SparkSession). The gate's crawl contract is NO FALSE NEGATIVES: a URL
reported seen is never refetched, and a URL actually inserted must never
read as unseen, including across deletes of OTHER keys and across a
failed over-capacity insert (eviction-chain unwind).

Reference analog: the Scala crawler's driver-resident ``alreadyCrawled``
HashSet (GeprisCrawler.scala) — exact, so its property set is trivially
"no false negatives"; the cuckoo shard must keep that half of the
contract while admitting bounded false positives.
"""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from ba_gepris_crawler_spark.operators.cuckoo import (
    _SLOTS,
    CuckooShard,
    _fingerprint,
    _mix,
)

# uint64 hash pairs; duplicates allowed in h-space (fingerprint collisions
# are the interesting regime), but keys themselves are unique pairs.
_hash_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**64 - 1),
        st.integers(min_value=0, max_value=2**64 - 1),
    ),
    min_size=1,
    max_size=300,
    unique=True,
)


def _cols(pairs):
    h1 = np.array([p[0] for p in pairs], dtype=np.uint64)
    h2 = np.array([p[1] for p in pairs], dtype=np.uint64)
    return h1, h2


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**64 - 1),
    st.integers(min_value=3, max_value=20),
)
def test_i2_is_an_involution(h2, log_m):
    """Partial-key invariant (Fan et al. §3.1): either bucket recovers the
    other — i2(i2(i1, fp), fp) == i1 — for every fp and power-of-two m.
    This is what lets contains/delete probe from i1 without knowing which
    bucket the insert (or a later eviction) left the fingerprint in."""
    sh = CuckooShard(table=np.zeros((1 << log_m, _SLOTS), dtype=np.uint16), m=1 << log_m)
    fp = _fingerprint(np.array([h2], dtype=np.uint64))
    i1 = np.arange(sh.m, dtype=np.int64)
    i2 = sh._i2(i1, np.repeat(fp, sh.m))
    back = sh._i2(i2, np.repeat(fp, sh.m))
    assert (back == i1).all()
    assert ((0 <= i2) & (i2 < sh.m)).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=500))
def test_fingerprint_nonzero_16bit(h2s):
    fp = _fingerprint(np.array(h2s, dtype=np.uint64))
    assert fp.dtype == np.uint16
    assert (fp != 0).all()


def _insert_or_discard(sh, h1, h2):
    """Insert, discarding the rare adversarial example where >2*_SLOTS
    generated keys share one (fp, bucket) orbit — such a set over-fills
    its two buckets at ANY table size (the documented over-capacity
    error, exercised by test_over_capacity_unwind_preserves_prefix, not
    a false-negative bug)."""
    try:
        sh.insert_many(h1, h2)
    except RuntimeError:
        assume(False)


@settings(max_examples=75, deadline=None)
@given(_hash_pairs)
def test_insert_then_contains_never_false_negative(pairs):
    h1, h2 = _cols(pairs)
    sh = CuckooShard.sized_for(len(pairs) * 2)
    _insert_or_discard(sh, h1, h2)
    assert sh.contains_many(h1, h2).all()
    assert sh.n_items == len(pairs)


@settings(max_examples=75, deadline=None)
@given(_hash_pairs, st.randoms(use_true_random=False))
def test_delete_subset_keeps_remaining_members(pairs, rnd):
    """Deleting a subset once each removes exactly one copy per key and
    never un-sees a remaining key — even when keys collide on
    (fingerprint, bucket), because insert stores duplicate copies
    (cuckoo.py:104-109) so each delete consumes its own copy."""
    h1, h2 = _cols(pairs)
    sh = CuckooShard.sized_for(len(pairs) * 2)
    _insert_or_discard(sh, h1, h2)
    k = rnd.randrange(len(pairs) + 1)
    idx = np.array(sorted(rnd.sample(range(len(pairs)), k)), dtype=np.int64)
    keep = np.setdiff1d(np.arange(len(pairs)), idx)
    removed = sh.delete_many(h1[idx], h2[idx])
    assert removed == k  # every deleted key was present
    assert sh.n_items == len(pairs) - k
    if keep.size:
        assert sh.contains_many(h1[keep], h2[keep]).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**64 - 1),
        st.integers(min_value=0, max_value=2**64 - 1),
    ),
    min_size=40,
    max_size=200,
    unique=True,
))
def test_over_capacity_unwind_preserves_prefix(pairs):
    """Insert one key at a time into a deliberately tiny shard; once an
    insert raises over-capacity, every key inserted BEFORE it must still
    be contained (the unwind replays the eviction chain in reverse), and
    n_items must not count the failed key."""
    sh = CuckooShard(table=np.zeros((8, _SLOTS), dtype=np.uint16), m=8)
    ok = 0
    for a, b in pairs:
        try:
            sh.insert_many(np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64))
            ok += 1
        except RuntimeError:
            break
    assert sh.n_items == ok
    if ok:
        h1, h2 = _cols(pairs[:ok])
        assert sh.contains_many(h1, h2).all()


def test_mix_is_bijective_sample():
    """splitmix64 finalizer must not collapse inputs (it is invertible on
    uint64); a collision here would silently merge two URLs' placements."""
    x = np.random.default_rng(7).integers(0, 2**64, size=200_000, dtype=np.uint64)
    x = np.unique(x)
    assert np.unique(_mix(x)).size == x.size
