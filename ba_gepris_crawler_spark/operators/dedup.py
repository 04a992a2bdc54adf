"""Deduplication operators for large-scale training-data pipelines.

All pure DataFrame/Catalyst plans (no Python in the hot path):

- exact_dedup:       hash-groupBy on content (map-side partial agg)
- minhash_signatures + lsh_candidate_pairs + verified_near_dups:
                     MinHash + LSH banding; candidates are (bucket-anchor,
                     member) pairs — linear in bucket size, never the full
                     clique — then verified with true Jaccard
- simhash:           per-bit majority vote over token hashes (64-bit)
- ngram_jaccard_pairs: naive shingle-bucket pairwise baseline (small data /
                     verification only; LSH is the scale path)

Token/shingle hashing uses xxhash64 (JVM-side). The driver-oracle twins in
plans/driver_queries.py use a portable md5-based hash instead so DuckDB can
replay them; semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.functions.textkit import TOKENIZE, shingle_sql


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return (
        df.select(id_col, F.explode(F.expr(TOKENIZE.format(col=text_col))).alias("tok"))
        .dropDuplicates([id_col, "tok"])
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """n-token shingles per doc. Sub-n-token docs yield NO shingles (not a
    crash, not bogus partials): shingle_sql guards the sequence bound —
    Spark's sequence(1, 0) descends to [1, 0] instead of being empty, so
    the old greatest(..., 0) form indexed past the token array and died
    with INVALID_ARRAY_INDEX under ANSI mode on any short document."""
    toks = F.expr(TOKENIZE.format(col=text_col))
    sh = F.expr(shingle_sql(n))
    return (
        df.withColumn("toks", toks)
        .select(id_col, F.explode(sh).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical content: (content_hash, keeper_id, n_copies,
    member_ids). Keeper = min id (deterministic).

    Grouped on TWO independently-salted xxhash64 values (128 bits), not
    one: at the 10^10-document regime a single 64-bit hash expects n²/2^65
    ≈ a few collisions, each silently merging two DISTINCT documents into
    one group and dropping a unique doc from the corpus via member_ids.
    At 128 bits the expectation is ~10^-19 — a second cheap hash pass
    buys collision-free grouping without a byte-compare verify stage.
    content_hash (the unsalted value) is kept as the group label."""
    salted = F.xxhash64(F.concat(F.col(text_col), F.lit("\x01exact")))
    return (
        df.groupBy(
            F.xxhash64(F.col(text_col)).alias("content_hash"),
            salted.alias("_content_hash2"),
        )
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .drop("_content_hash2")
    )


_P = 2147483647


def minhash_signatures(
    unit_df: DataFrame, id_col: str = "doc_id", unit_col: str = "shingle", num_perm: int = 16,
    hashed_units: DataFrame | None = None,
) -> DataFrame:
    """One row per doc with m0..m{k-1} minhash columns. Input: exploded
    (id, shingle|token) rows. Single shuffle on id (the groupBy). Pass
    `hashed_units` (id, hv with hv in [0, P)) to inject a precomputed /
    portable unit hash (the DuckDB-oracled driver twin does, mirroring
    simhash's hashed_tokens); xxhash64 stays the scale default."""
    if hashed_units is not None:
        h = hashed_units
    else:
        h = unit_df.withColumn("hv", F.pmod(F.xxhash64(F.col(unit_col)), F.lit(_P)))
    aggs = [
        F.min(F.expr(f"({2 * j + 1} * hv + {7 * j + 3}) % {_P}")).alias(f"m{j}")
        for j in range(num_perm)
    ]
    return h.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", num_perm: int = 16, bands: int = 4,
    max_bucket: int = 256,
) -> DataFrame:
    """(doc_a, doc_b) candidates: ALL (a<b) pairs of docs sharing any band
    bucket, via a co-keyed self-join on (band, band-key) — up to
    `max_bucket` members per bucket; beyond that the bucket degrades to
    (min-id anchor, member) star edges.

    All-pairs, not anchor-only, in the normal regime: anchor pairing
    silently LOST every near-dup pair where neither doc is the bucket's
    min id — when the anchor itself is a band false positive, both its
    edges fail the Jaccard verify stage downstream, so connected
    components never sees the true pair either (the identical defect
    already fixed in similarity.sketch_bucket_pairs).

    The `max_bucket` guard is the scale bound: a bucket holding a large
    corpus fraction (measured: one 2-row band bucket held 77% of the
    synthetic corpus) means the banding parameters have failed for this
    corpus, and all-pairs there is O(n^2) — at 10^10 docs an executor
    killer. Degenerate buckets get linear anchor-star edges instead
    (recall there rests on the anchor verifying, the documented
    tradeoff); the rule is deterministic on bucket size, so the DuckDB
    oracle replays it exactly. Run exact_dedup FIRST so byte-identical
    mega-clusters never reach banding at all.

    One signature computation -> `bands` rows per doc via a SINGLE explode
    of a band-struct array. A per-band unionByName would re-run the whole
    upstream signature pipeline once per band: Spark does not reuse
    non-persisted identical subplans (ReuseExchange does not fire)."""
    rows_per_band = num_perm // bands
    band_structs = ", ".join(
        "named_struct('band', {b}, 'bkey', xxhash64(concat_ws('_', {cols})))".format(
            b=b,
            cols=", ".join(f"cast(m{b * rows_per_band + r} as string)" for r in range(rows_per_band)),
        )
        for b in range(bands)
    )
    parts = sig.select(
        F.col(id_col), F.explode(F.expr(f"array({band_structs})")).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    w = Window.partitionBy("band", "bkey")
    parts = parts.withColumn("_bsz", F.count("*").over(w)).withColumn(
        "_anchor", F.min(id_col).over(w)
    )
    # LEFT side: every member of a normal bucket, but ONLY the anchor row
    # of a degenerate one — the join then yields full all-pairs where that
    # is cheap and exactly the linear (anchor, member) star where it is
    # not, in ONE pass (a separate star-branch union would scan — and
    # re-run — the whole signature pipeline a third time; the join's
    # match count in a degenerate bucket is 1 x n, never n^2)
    pa = parts.filter(
        (F.col("_bsz") <= max_bucket) | (F.col(id_col) == F.col("_anchor"))
    ).select(F.col(id_col).alias("doc_a"), "band", "bkey")
    pb = parts.select(F.col(id_col).alias("doc_b"), "band", "bkey")
    return (
        pa.join(pb, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()  # a pair sharing several bands appears once
    )


def verified_near_dups(
    cand: DataFrame, unit_df: DataFrame, id_col: str = "doc_id", unit_col: str = "shingle",
    threshold: float = 0.7,
) -> DataFrame:
    """Exact Jaccard over candidate pairs only: |A∩B| / (|A|+|B|-|A∩B|)."""
    ta = unit_df.select(F.col(id_col).alias("doc_a"), F.col(unit_col).alias("u_a"))
    tb = unit_df.select(F.col(id_col).alias("doc_b"), F.col(unit_col).alias("u_b"))
    common = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(F.col("u_a") == F.col("u_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = unit_df.groupBy(id_col).agg(F.count("*").alias("n"))
    j = (
        common.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return j.filter(jac >= threshold).select("doc_a", "doc_b", jac.alias("jaccard"))


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64,
    hashed_tokens: DataFrame | None = None,
) -> DataFrame:
    """SimHash: per-bit majority vote over token hashes. Two shuffles (bit
    agg keyed by (id, bit) then id); the bit explosion is a narrow op.
    Pass `hashed_tokens` (id, hv) to inject a precomputed/portable token
    hash (the oracled driver twin does); xxhash64 is the scale default."""
    if hashed_tokens is not None:
        tok = hashed_tokens
    else:
        tok = tokens(df, text_col, id_col).withColumn("hv", F.xxhash64("tok"))
    b = tok.select(id_col, "hv", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"))
    votes = b.groupBy(id_col, "bit").agg(
        F.when(F.sum(F.when(F.expr("(hv >> bit) & 1 = 1"), 1).otherwise(-1)) >= 0, 1).otherwise(0).alias("v")
    )
    # NB: shiftleft must be on a BIGINT — `1 << bit` is INT arithmetic in
    # Spark SQL and wraps for bit >= 31, collapsing the upper 32 bits.
    return votes.groupBy(id_col).agg(
        F.sum(F.expr("v * shiftleft(cast(1 as bigint), bit)")).cast("long").alias("simhash")
    )


def simhash_near_dups(sim: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance, bucketed on 4 simhash quarters
    (two near-dups within distance<=3 share at least one exact quarter —
    pigeonhole), so the pairwise test only runs inside small buckets.

    ALL pairs within a bucket are tested (a co-keyed self-join on the
    quarter key), not just (min-id anchor, member) pairs: anchor-only
    pairing silently missed any near-dup pair where neither doc is the
    bucket's min id (e.g. bucket {a,b,c} with hamming(b,c)=2 but a far
    from both), which broke the pigeonhole completeness guarantee this
    docstring promises. lsh_candidate_pairs tests all pairs for the same
    reason — a downstream connected-components stage cannot recover a
    pair whose anchor edges both failed verification. Quadratic only
    within one 16-bit-quarter bucket; the simhash columns ride the join,
    so no lookup joins back to `sim` are needed."""
    # single explode of quarter-structs (not a 4-way union: unpersisted
    # shared subplans would recompute the simhash pipeline per quarter)
    q_structs = ", ".join(
        f"named_struct('q', {q}, 'qkey', shiftright(simhash, {q * 16}) & 65535)" for q in range(4)
    )
    parts = sim.select(
        id_col, "simhash", F.explode(F.expr(f"array({q_structs})")).alias("qq")
    ).select(id_col, "simhash", F.col("qq.q").alias("q"), F.col("qq.qkey").alias("qkey"))
    pa = parts.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "q", "qkey")
    pb = parts.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "q", "qkey")
    return (
        pa.join(pb, ["q", "qkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()  # a pair sharing several quarters appears once
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star step: every node's strictly-larger neighbors connect to
    the min of its closed neighborhood."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star step: orient edges larger->smaller; each node and its
    smaller neighbors connect to the neighborhood min."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")).filter(
        F.col("u") != F.col("v")
    )
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    return (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iter: int = 30
) -> DataFrame:
    """Connected components over an undirected edge list via the
    alternating large-star / small-star algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm, re-expressed as DataFrame ops). Converges in O(log n)
    alternation rounds; every step is a groupBy-min + join — no windows,
    no driver-side data. Returns (node, component_id) for every node that
    appears in a non-degenerate edge (self-loops are dropped at entry),
    component_id = min node id of its component.

    The returned frame is derived ONLY from the eagerly-checkpointed
    fixpoint star (members on the u side, roots on the v side) — never
    from the raw `edges` argument — so materializing it later replays a
    local-checkpoint scan, not the caller's upstream pipeline (the r2
    blemish: dedup_clusters re-ran the whole minhash->band->verify chain
    once to enumerate nodes after its token cache was gone).

    This is the missing piece between near-dup PAIR generation
    (lsh_candidate_pairs / simhash_near_dups) and "keep one doc per
    duplicate cluster": pairs rarely form cliques, so keeping
    min-per-pair under-deletes without the transitive closure."""
    e = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    prev_sig = None
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).persist()
        row = e2.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent set checksum, overflow-free (ANSI)
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        e.unpersist()
        e = e2
        if sig == prev_sig:  # star fixpoint: every node points at its root
            break
        prev_sig = sig
    # cut the iteration lineage (and free the loop cache) so consumers of
    # the returned frame never replay the alternation chain
    final = e.localCheckpoint(eager=True)
    e.unpersist()
    # at the star fixpoint every non-root appears exactly once as u with
    # v = its root, and every root appears (only) on the v side; the
    # defensive groupBy-min keeps the label correct even on a max_iter
    # bailout where the edge set is not yet a clean star
    members = final.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("component_id"))
    roots = final.select(F.col("v").alias("node")).distinct().withColumn(
        "component_id", F.col("node")
    )
    return (
        members.unionByName(roots)
        .groupBy("node")
        .agg(F.min("component_id").alias("component_id"))
    )


def dedup_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 16, bands: int = 4, threshold: float = 0.7,
) -> DataFrame:
    """End-to-end near-dup clustering: shingle-free token MinHash+LSH pairs
    -> Jaccard verification -> connected components -> (doc_id,
    cluster_keeper_id). Docs in no cluster keep themselves."""
    tok = tokens(df, text_col, id_col).persist()
    sig = minhash_signatures(tok, id_col=id_col, unit_col="tok", num_perm=num_perm)
    cand = lsh_candidate_pairs(sig, id_col=id_col, num_perm=num_perm, bands=bands)
    pairs = verified_near_dups(cand, tok, id_col=id_col, unit_col="tok", threshold=threshold)
    comp = connected_components(pairs, "doc_a", "doc_b")
    out = (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component_id", F.col(id_col)).alias("cluster_keeper_id"),
        )
    )
    tok.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Naive baseline: pairwise Jaccard for docs sharing any n-gram shingle.
    Quadratic in duplicate-cluster size — verification/small-data only.
    Candidates = all (a<b) pairs sharing a shingle; the exact-Jaccard step
    is verified_near_dups (one implementation of the join-groupBy-ratio
    block, not a second copy that could drift)."""
    sh = shingles(df, text_col, id_col, n)
    cand = (
        sh.select(F.col(id_col).alias("doc_a"), F.col("shingle").alias("s"))
        .join(sh.select(F.col(id_col).alias("doc_b"), F.col("shingle").alias("s")), "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return verified_near_dups(cand, sh, id_col=id_col, unit_col="shingle", threshold=threshold)
