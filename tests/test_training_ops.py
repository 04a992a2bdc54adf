"""Training-data pipeline operators: dedup family, similarity search,
text analysis, multimodal plumbing — with planted near-duplicates."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.operators import dedup as D
from ba_gepris_crawler_spark.operators import multimodal as MM
from ba_gepris_crawler_spark.operators import similarity as S
from ba_gepris_crawler_spark.operators import text_analysis as TA

WORDS = [f"w{n:03d}" for n in range(500)]  # wide vocab: random docs are NOT near-dups


@pytest.fixture(scope="module")
def corpus(spark):
    """60 docs: 3 exact-dup groups, 3 near-dup pairs (1-word edit), rest random."""
    rng = random.Random(7)
    rows = []
    base = {}
    for i in range(60):
        if i in (10, 11, 12):  # exact dups of doc 10
            text = base.get("e") or " ".join(rng.choice(WORDS) for _ in range(40))
            base["e"] = text
        elif i in (20, 21):  # near dups: one token differs
            text = base.get("n") or " ".join(rng.choice(WORDS) for _ in range(40))
            base["n"] = text
            if i == 21:
                toks = text.split()
                toks[5] = "REPLACED"
                text = " ".join(toks)
        else:
            text = " ".join(rng.choice(WORDS) for _ in range(40))
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(corpus):
    groups = {r.keeper_id: r for r in D.exact_dedup(corpus).filter("n_copies > 1").collect()}
    assert list(groups) == [10]
    assert groups[10].n_copies == 3
    assert groups[10].member_ids == [10, 11, 12]


def test_minhash_lsh_finds_near_dups(corpus):
    toks = D.tokens(corpus)
    sig = D.minhash_signatures(toks, unit_col="tok", num_perm=16)
    cand = D.lsh_candidate_pairs(sig, num_perm=16, bands=4)
    found = D.verified_near_dups(cand, toks, unit_col="tok", threshold=0.7)
    pairs = {(r.doc_a, r.doc_b) for r in found.collect()}
    assert (10, 11) in pairs and (10, 12) in pairs  # exact dups found
    assert (20, 21) in pairs  # 1-token edit caught
    for a, b in pairs:  # no false positives among random docs
        assert {a, b} <= {10, 11, 12, 20, 21}


def test_connected_components_chain_and_star(spark):
    """A 4-chain, a triangle, and a singleton pair: every node must get the
    component min, including nodes only reachable transitively (the case
    min-per-pair keeps wrong)."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.component_id for r in D.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_planted_group(corpus):
    """The planted 3-doc exact-dup group (10, 11, 12) must collapse into
    ONE cluster kept by doc 10; the near-dup pair (20, 21) clusters too;
    unrelated docs keep themselves."""
    out = {r.doc_id: r.cluster_keeper_id for r in D.dedup_clusters(corpus, threshold=0.7).collect()}
    assert len(out) == 60
    assert out[10] == out[11] == out[12] == 10
    assert out[20] == out[21] == 20
    assert out[0] == 0 and out[55] == 55


def test_dedup_clusters_output_plan_is_checkpoint_only(corpus):
    """The frame dedup_clusters returns must be derived from the eagerly
    checkpointed component fixpoint — materializing it later must NOT
    replay the minhash->band->verify chain (r2 blemish: the nodes side
    re-ran the full LSH pipeline once after the token cache was gone)."""
    out = D.dedup_clusters(corpus, threshold=0.7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("explode", "xxhash64", "split("):
        assert marker not in plan, f"LSH chain leaked into output plan via {marker}"


def test_lsh_banding_runs_signature_pipeline_once(corpus):
    """The band fan-out must be a single explode, not an N-way union: Spark
    re-runs unpersisted shared subplans per union branch, so the source
    would be scanned `bands` times. One source scan in the physical plan
    proves the signature pipeline runs once."""
    toks = D.tokens(corpus)
    sig = D.minhash_signatures(toks, unit_col="tok", num_perm=16)
    plan = D.lsh_candidate_pairs(sig, num_perm=16, bands=4)._jdf.queryExecution().executedPlan().toString()
    # the all-pairs self-join scans the band-exploded frame twice (like
    # simhash_near_dups below): 2 scans total, never `bands` union scans
    assert plan.count("Scan ExistingRDD") <= 2
    sim_plan = D.simhash_near_dups(D.simhash(corpus))._jdf.queryExecution().executedPlan().toString()
    # simhash_near_dups self-joins the quarter-exploded frame (the simhash
    # columns ride the join): 2 scans total, never 4+2 from a quarter union
    assert sim_plan.count("Scan ExistingRDD") <= 2


def test_simhash_near_dups(corpus):
    sim = D.simhash(corpus, bits=64)
    vals = {r.doc_id: r.simhash for r in sim.collect()}
    assert vals[10] == vals[11] == vals[12]
    ham_edit = bin(vals[20] ^ vals[21]).count("1")
    assert ham_edit <= 12  # 1-token edit stays close in simhash space
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in D.simhash_near_dups(sim, max_hamming=12).collect()}
    assert (10, 11) in pairs and pairs[(10, 11)] == 0
    # quarter-bucket pigeonhole guarantee only holds for distance <= 3;
    # the edit pair must be found whenever it shares a 16-bit quarter
    shares_quarter = any((vals[20] >> (q * 16)) & 0xFFFF == (vals[21] >> (q * 16)) & 0xFFFF for q in range(4))
    assert ((20, 21) in pairs) == shares_quarter
    for (a, b), h in pairs.items():
        assert bin(vals[a] ^ vals[b]).count("1") == h  # reported distances exact


def test_ngram_jaccard_baseline(corpus):
    found = {(r.doc_a, r.doc_b) for r in D.ngram_jaccard_pairs(corpus, n=3, threshold=0.5).collect()}
    assert (10, 11) in found and (20, 21) in found


def test_shingles_safe_on_short_docs(spark):
    """Docs with fewer than n tokens must yield NO shingles — not an ANSI
    INVALID_ARRAY_INDEX crash (Spark's sequence(1, 0) DESCENDS to [1, 0],
    unlike DuckDB's empty generate_series) and not bogus partial shingles
    that make short docs spuriously match (review r5 training-ops #1)."""
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "a"), (3, "a b"), (4, "a b c"), (5, "a b c d")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.shingle) for r in D.shingles(df, n=3).collect()}
    assert got == {(4, "a b c"), (5, "a b c"), (5, "b c d")}
    # and the pairwise baseline runs end-to-end over a corpus with shorts
    pairs = {(r.doc_a, r.doc_b) for r in D.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()}
    assert pairs == {(4, 5)}  # jaccard({abc},{abc,bcd}) = 0.5


def test_simhash_near_dups_finds_nonanchor_pairs(spark):
    """A near-dup pair where NEITHER doc is its buckets' min-id anchor must
    still be found (review r5 training-ops #5): v5/v9 differ by 2 bits but
    every quarter bucket containing both also contains a smaller far id
    (1 shares their q0, 0 shares their q2+q3), so anchor-only pairing
    generated only (1,5),(1,9),(0,5),(0,9) and the true pair (5,9) was
    silently dropped — breaking the docstring's pigeonhole completeness."""
    v5 = 0x0003_0002_0000_0001
    v9 = 0x0003_0002_0003_0001  # hamming(v5, v9) = 2, all in quarter 1
    v1 = 0x7F00_FF00_FF00_0001  # shares ONLY q0 with v5/v9, far from both
    v0 = 0x0003_0002_00FF_00FF  # shares ONLY q2+q3 with v5/v9, far from both
    sim = spark.createDataFrame(
        [(0, v0), (1, v1), (5, v5), (9, v9)], "doc_id long, simhash long"
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in D.simhash_near_dups(sim, max_hamming=3).collect()}
    assert pairs == {(5, 9): 2}


@pytest.fixture(scope="module")
def vectors(spark):
    """40 vectors in 8-dim; 35 is a near-copy of 3."""
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    rng = random.Random(3)
    rows = []
    vecs = {}
    for i in range(40):
        v = [f32(rng.uniform(-1, 1)) for _ in range(8)]
        if i == 35:
            v = [f32(x + 0.01) for x in vecs[3]]
        vecs[i] = v  # float32-exact, matching what Spark reads from array<float>
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def _brute_topk(vecs, qid, k):
    import math

    q = vecs[qid]
    nq = math.sqrt(sum(x * x for x in q))
    scored = []
    for i, v in vecs.items():
        if i == qid:
            continue
        dot = sum(a * b for a, b in zip(q, v))
        nv = math.sqrt(sum(x * x for x in v))
        scored.append((dot / (nv * nq), -i))
    scored.sort(reverse=True)
    return [-i for _, i in scored[:k]]


def test_cosine_topk_exact(vectors):
    df, vecs = vectors
    q = df.filter("vec_id in (3, 7)").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    got = S.cosine_topk(df, q, k=5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.qid, []).append((r.rnk, r.vec_id))
    for qid in (3, 7):
        want = _brute_topk(vecs, qid, 5)
        assert [v for _, v in sorted(by_q[qid])] == want, qid
    assert by_q[3][0][1] == 35  # the planted near-copy is rank 1


def test_ivf_recall_of_planted_neighbor(vectors):
    df, _ = vectors
    cents = df.filter("vec_id % 10 = 0").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    index = S.ivf_index(df, cents)
    assert index.count() == 40
    q = df.filter("vec_id = 3").select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    got = S.ivf_topk(index, cents, q, k=3, nprobe=4)
    top = [r.vec_id for r in got.orderBy("rnk").collect()]
    assert 35 in top  # near-copy recalled through the probed cells


def test_ivf_written_index_prunes_partitions(vectors, tmp_path, spark):
    """The persisted index is partitioned BY cell; a probe search must read
    ONLY the probed cells' files (partition pruning) and return exactly the
    in-memory ivf_topk result."""
    df, _ = vectors
    cents = df.filter("vec_id % 10 = 0").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    index = S.ivf_index(df, cents)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(index, path)
    q = df.filter("vec_id = 3").select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))

    got = S.ivf_topk_from_store(spark, path, cents, q, k=3, nprobe=2)
    want = S.ivf_topk(index, cents, q, k=3, nprobe=2)
    assert sorted(map(tuple, got.select("qid", "vec_id", "rnk").collect())) == \
           sorted(map(tuple, want.select("qid", "vec_id", "rnk").collect()))

    # pruning with NO driver collect (VERDICT r3 #6): the broadcast join on
    # the partition column must plan a DYNAMIC partition-pruning filter on
    # cid — the probed cell set reaches the scan from the broadcast at
    # runtime, never through a collected literal IN list
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan

    # the many-queries regime (probe side too big to broadcast) joins
    # co-keyed on the cell column and must return the same rows
    big = S.ivf_topk_from_store(spark, path, cents, q, k=3, nprobe=2, many_queries=True)
    assert sorted(map(tuple, big.select("qid", "vec_id", "rnk").collect())) == \
           sorted(map(tuple, want.select("qid", "vec_id", "rnk").collect()))


def test_asof_join_semantics_with_ties(spark):
    """As-of join: latest right row at-or-before each left ts; an
    EQUAL-timestamp right row is visible; no prior right row -> nulls."""
    from ba_gepris_crawler_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, "l5"), (1, 10, "l10"), (1, 2, "l2"), (2, 7, "l7")],
        "user_id long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 3, 30.0), (1, 5, 50.0), (1, 9, 90.0), (2, 8, 80.0)],
        "user_id long, ts long, value double",
    )
    out = {
        (r.user_id, r.ts): r.value_asof
        for r in asof_join(left, right, key="user_id", right_cols=("value",)).collect()
    }
    assert out == {
        (1, 2): None,      # nothing at-or-before
        (1, 5): 50.0,      # the equal-ts right row wins over ts=3
        (1, 10): 90.0,     # latest at-or-before
        (2, 7): None,      # user 2's only right row is later
    }


def test_asof_join_duplicate_right_ts_is_deterministic(spark):
    """Multiple right rows on the SAME (key, ts): the payload tiebreaker
    must make the carried value stable across runs and partitionings
    (greatest payload wins) — ADVICE r2 nondeterminism fix."""
    from ba_gepris_crawler_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5, "l")], "user_id long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 5, 10.0), (1, 5, 30.0), (1, 5, 20.0), (1, 4, 99.0)],
        "user_id long, ts long, value double",
    )
    for reps in range(3):
        r = right.repartition(reps + 1)
        got = asof_join(left, r, key="user_id", right_cols=("value",)).collect()
        assert [x.value_asof for x in got] == [30.0], got


def test_asof_join_map_payload_is_supported(spark):
    """A non-orderable payload type (MapType) must not break the
    determinism ORDER BY — it tie-breaks by xxhash64 instead (ADVICE r3)."""
    from ba_gepris_crawler_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5, "l"), (1, 2, "m")],
                                 "user_id long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 3, {"a": 1}), (1, 4, {"b": 2})],
        "user_id long, ts long, attrs map<string,int>",
    )
    got = {
        (r.user_id, r.ts): r.attrs_asof
        for r in asof_join(left, right, key="user_id", right_cols=("attrs",)).collect()
    }
    assert got == {(1, 5): {"b": 2}, (1, 2): None}


def test_range_join_bin_boundaries(spark):
    """Bucketed range join: matches across bin boundaries, inclusive ends,
    no duplicate pairs for intervals spanning many bins."""
    from ba_gepris_crawler_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, 100, 0), (1, 101, 3600), (1, 102, 3601), (1, 103, 10800), (2, 200, 50)],
        "user_id long, click_id long, tc long",
    )
    intervals = spark.createDataFrame(
        [(1, 10, 0, 3600), (1, 11, 3500, 9999), (2, 20, 60, 70)],
        "user_id long, signup_id long, t0 long, t1 long",
    )
    out = {
        (r.signup_id, r.click_id)
        for r in range_join(points, intervals, key="user_id", ts_col="tc",
                            start_col="t0", end_col="t1", bin_width=1000).collect()
    }
    assert out == {
        (10, 100), (10, 101),          # inclusive end t1=3600
        (11, 101), (11, 102),          # interval spanning 7 bins, each pair once
    }  # (2,...) empty: point 50 before interval [60,70]


def test_lsh_sketch_similar_vectors_share_bits(vectors):
    df, _ = vectors
    sk = {r.vec_id: r.lsh_sketch for r in S.random_hyperplane_sketch(df, n_planes=16).collect()}
    ham = bin(sk[3] ^ sk[35]).count("1")
    assert ham <= 2  # near-copies agree on almost all hyperplane signs


def test_text_analysis_ops(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the hat of things"), (1, "der hund und das haus"), (2, "xyzzy plugh")],
        "doc_id long, text string",
    )
    lang = {r.doc_id: r.predicted_lang for r in TA.language_id(df).collect()}
    assert lang == {0: "en", 1: "de", 2: "unknown"}
    q = {r.doc_id: r for r in TA.quality_score(df).collect()}
    assert 0 < q[0].quality_score < 1
    assert q[0].stopword_ratio > q[2].stopword_ratio
    tc = {r.doc_id: r for r in TA.token_counts(df).collect()}
    assert tc[0].n_ws_tokens == 7
    fp = {r.doc_id: r.fingerprint for r in TA.fingerprint(df).collect()}
    assert len(set(fp.values())) == 3  # distinct docs -> distinct fingerprints
    fp2 = {r.doc_id: r.fingerprint for r in TA.fingerprint(df).collect()}
    assert fp == fp2  # deterministic


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(i, f"payload body {i} " * (i + 1)) for i in range(9)], "doc_id long, text string"
    )
    media = MM.documents_as_media(docs)
    feats = MM.extract_features(media)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == 9
    assert all(r.n_bytes > 0 and len(r.digest) == 32 for r in rows.values())
    frames = MM.sample_frames(media, every_nth=5)
    fr = frames.collect()
    assert len(fr) > 0
    assert {r.doc_id % 3 for r in fr} == {2}  # only video rows fan out
    with pytest.raises(NotImplementedError):
        MM.real_decode(b"x")


def test_caption_align_on_crawled_corpus(spark):
    """The interleaved operators must run on the ENGINE's own documents
    shape (doc_id, spans<kind,text,media_ref,offset>) — the input_hint
    table — not only on synthesized fixtures: every img span of every
    crawled person page pairs with its nearest PRECEDING span in document
    order, and the modality profile sums match the raw span counts."""
    from ba_gepris_crawler_spark.sources.synthetic_site import SiteConfig
    from ba_gepris_crawler_spark.testing.fixtures import site_documents_df

    cfg = SiteConfig(
        hosts=("h00.gepris.example.org",),
        n_projects=40, n_persons=30, n_institutions=8, hits_per_page=50, seed=42,
    )
    docs = site_documents_df(spark, cfg).select("doc_id", "spans")

    aligned = MM.caption_align(docs)
    rows = aligned.collect()
    assert rows, "site corpus contains no media spans"
    # every alignment: caption is a text span strictly before the media span
    assert all(r["caption_dist"] >= 1 for r in rows if r["caption"] is not None)
    # cross-check one document by hand against its raw span sequence
    some_doc = rows[0]["doc_id"]
    spans = docs.filter(F.col("doc_id") == some_doc).select(F.explode("spans").alias("s")).collect()
    by_off = sorted((r["s"]["offset"], r["s"]["kind"], r["s"]["text"]) for r in spans)
    for r in [x for x in rows if x["doc_id"] == some_doc]:
        preceding_text = [t for off, kind, t in by_off if off < r["span_off"] and kind == "text" and t is not None]
        assert r["caption"] == (preceding_text[-1] if preceding_text else None)

    prof = MM.interleave_stats(docs)
    tot = prof.agg(F.sum("n_spans"), F.sum("n_media")).first()
    raw = docs.select(
        F.sum(F.size("spans")),
        F.sum(F.size(F.filter("spans", lambda s: s["kind"] != "text"))),
    ).first()
    assert (tot[0], tot[1]) == (raw[0], raw[1])


def test_sketch_bucket_pairs_all_pairs_within_bucket(spark):
    """Every (a<b) pair sharing a sketch bucket is a candidate, not just
    (min-anchor, member) pairs: with bucket {1, 5, 9} the pair (5, 9) must
    be generated — under anchor pairing it never was, and a far-off anchor
    (a hash false positive) made verify_pairs_cosine drop the genuinely
    similar pair with no downstream recovery (review r5 training-ops #6)."""
    sk = spark.createDataFrame(
        [(1, 7), (5, 7), (9, 7), (2, 8)], "vec_id long, lsh_sketch long"
    )
    pairs = {(r.vec_a, r.vec_b) for r in S.sketch_bucket_pairs(sk).collect()}
    assert pairs == {(1, 5), (1, 9), (5, 9)}


def test_cosine_zero_norm_vector_is_null_not_crash(spark):
    """An all-zero embedding (failed encode / padding artifact) must not
    abort similarity ops with an ANSI DIVIDE_BY_ZERO: its cosine is NULL,
    it never occupies a top-k slot, and verify drops it (review r5
    training-ops #4)."""
    rows = [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0, 0.0]), (3, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 1").select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    got = S.cosine_topk(df, q, k=10).collect()
    assert [r.vec_id for r in sorted(got, key=lambda r: r.rnk)] == [2, 3]  # 0 excluded
    assert all(r.cosine is not None for r in got)
    cand = spark.createDataFrame([(0, 1), (1, 2)], "vec_a long, vec_b long")
    ver = S.verify_pairs_cosine(cand, df, threshold=0.0).collect()
    assert {(r.vec_a, r.vec_b) for r in ver} == {(1, 2)}  # zero-norm pair dropped
    # IVF paths survive a zero-norm corpus vector too
    cents = df.filter("vec_id in (1, 3)").select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    idx = S.ivf_index(df, cents)
    assert idx.count() == 4  # the zero vector still gets a (tie-broken) cell
    top = S.ivf_topk(idx, cents, q, k=10, nprobe=2).collect()
    assert all(r.cosine is not None for r in top)


def test_quality_score_empty_doc_is_null_not_crash(spark):
    """Blank pages are routine in a crawl: a whitespace-only doc must score
    NULL (matching DuckDB division semantics), not kill the job with an
    ANSI DIVIDE_BY_ZERO (review r5 training-ops #2)."""
    df = spark.createDataFrame(
        [(0, "the cat and the hat"), (1, "   "), (2, "")], "doc_id long, text string"
    )
    q = {r.doc_id: r for r in TA.quality_score(df).collect()}
    assert q[0].quality_score is not None
    for i in (1, 2):
        assert q[i].n_tokens == 0
        assert q[i].quality_score is None
        assert q[i].stopword_ratio is None and q[i].avg_token_len is None


def test_interleave_stats_empty_spans_null_ratio(spark):
    """A fetched-but-content-free page (spans = []) gets a NULL media_ratio
    instead of an ANSI 0/0 crash (review r5 training-ops #7)."""
    schema = (
        "doc_id long, spans array<struct<kind string, text string, media_ref string, offset int>>"
    )
    docs = spark.createDataFrame(
        [(0, []), (1, [("text", "t", None, 0), ("img", None, "m", 1)])], schema
    )
    prof = {r.doc_id: r for r in MM.interleave_stats(docs).collect()}
    assert prof[0].n_spans == 0 and prof[0].media_ratio is None
    assert prof[1].media_ratio == 0.5


def test_documents_as_media_negative_id(spark):
    """pmod, not %: a negative doc_id must map into the media-type array,
    not hit element_at index 0 (runtime error) or wrap from the end
    (review r5 training-ops #9)."""
    docs = spark.createDataFrame([(-1, "x"), (-2, "y"), (-3, "z"), (0, "w")], "doc_id long, text string")
    mt = {r.doc_id: r.media_type for r in MM.documents_as_media(docs).collect()}
    assert mt == {-3: "image", -2: "audio", -1: "video", 0: "image"}


def test_lsh_candidate_pairs_are_all_pairs_not_anchor(spark):
    """Bucket {1,2,3}: anchor-only pairing emitted (1,2) and (1,3) — if doc
    1 is a band false positive, both edges fail Jaccard verification and
    the true pair (2,3) is lost with no recovery (connected components
    only runs over VERIFIED pairs; review r5 final, same defect as
    similarity.sketch_bucket_pairs). All (a<b) pairs must be candidates."""
    sig = spark.createDataFrame(
        [(1, 5, 5, 101, 102), (2, 5, 5, 201, 202), (3, 5, 5, 301, 302),
         (4, 9, 9, 401, 402)],
        "doc_id long, m0 int, m1 int, m2 int, m3 int",
    )
    cand = D.lsh_candidate_pairs(sig, num_perm=4, bands=2)
    pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_lsh_degenerate_bucket_degrades_to_anchor_star(spark):
    """A bucket past max_bucket is a banding failure (measured: one 2-row
    band bucket held 77% of the synthetic corpus) — all-pairs there is
    O(n^2). It must degrade to linear (min-id anchor, member) star edges,
    while normal buckets keep full all-pairs recall."""
    rows = [(i, 5, 5, 1000 + i, 2000 + i) for i in range(1, 6)]  # bucket of 5
    rows.append((100, 9, 9, 3000, 3001))  # pair bucket
    rows.append((101, 9, 9, 3100, 3101))
    sig = spark.createDataFrame(rows, "doc_id long, m0 int, m1 int, m2 int, m3 int")
    cand = D.lsh_candidate_pairs(sig, num_perm=4, bands=2, max_bucket=3)
    pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
    # degenerate bucket {1..5}: anchor-star only (1,x); small bucket {100,101}: all pairs
    assert pairs == {(1, 2), (1, 3), (1, 4), (1, 5), (100, 101)}


def test_asof_join_matched_row_null_stays_null(spark):
    """DuckDB ASOF semantics: the payload comes from THE matched (latest
    at-or-before) right row — including its NULLs. Per-column
    last(ignorenulls) back-filled a NULL from an OLDER row, stitching a
    frankenrow from two different purchases (review r5 ops #1)."""
    from ba_gepris_crawler_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, 10, 100, 5.0), (1, 20, 101, None)],
        "user_id long, ts long, purchase_id long, value double",
    )
    left = spark.createDataFrame([(1, 30)], "user_id long, ts long")
    row = asof_join(
        left, right, key="user_id", right_cols=("purchase_id", "value")
    ).collect()[0]
    assert row["purchase_id_asof"] == 101 and row["value_asof"] is None


def test_cosine_nan_embedding_is_null_not_topk_winner(spark):
    """A NaN component (failed-encode artifact) made cosine NaN, which
    Spark orders ABOVE every real double: it passed isNotNull, ranked
    rnk=1 for every query, and passed >= threshold as a confirmed
    near-dup (review r5 ops #2). NaN cosine must be NULL like zero-norm."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [float("nan"), 1.0]), (3, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame([(100, [1.0, 0.0])], "qid long, qe array<float>")
    top = S.cosine_topk(corpus, queries, k=2)
    got = [(r.vec_id, r.rnk) for r in top.orderBy("rnk").collect()]
    assert got == [(1, 1), (3, 2)]  # NaN row never ranks
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "vec_a long, vec_b long")
    vecs = corpus
    verified = S.verify_pairs_cosine(pairs, vecs, threshold=0.5)
    assert {(r.vec_a, r.vec_b) for r in verified.collect()} == {(1, 3)}


def test_ivf_topk_excludes_self_matches(spark):
    """In-corpus queries: the query's own vector sits in its cell at
    cosine 1.0 and always took rnk=1, burning a k slot and skewing any
    recall measurement against the cosine_topk baseline (review r5 ops
    #4) — IVF must exclude id == qid like the exact baseline does."""
    import math

    rows = [(i, [math.cos(i / 7.0), math.sin(i / 7.0)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    queries = emb.filter(F.col("vec_id") == 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    index = S.ivf_index(emb, cents)
    out = S.ivf_topk(index, cents, queries, k=3, nprobe=2).collect()
    assert all(r.vec_id != 10 for r in out)
    assert len(out) == 3


def test_analysis_tables_over_crawl_documents(spark):
    """plans/analysis.analysis_tables: the training-data composition over
    crawl-shaped documents — planted exact dups group, planted near-dups
    verify, metrics cover every doc."""
    from ba_gepris_crawler_spark.plans.analysis import analysis_tables

    def doc(i, text):
        spans = [{"kind": "title", "text": text, "media_ref": None, "offset": 0}]
        return (f"d{i}", f"https://h/{i}", "h", spans)

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        doc(0, base),
        doc(1, base),                      # exact dup of d0
        doc(2, base + " with a tail"),     # near dup of d0/d1
        doc(3, "vollkommen anderer deutscher text ohne gemeinsamkeit und zwar der"),
        doc(4, ""),                        # blank page: NULL quality, no crash
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, url string, host string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    t = analysis_tables(docs, near_dup_threshold=0.5, num_perm=8, bands=4)
    m = {r["doc_id"]: r for r in t["doc_metrics"].collect()}
    assert set(m) == {"d0", "d1", "d2", "d3", "d4"}
    assert m["d0"]["predicted_lang"] == "en"
    assert m["d4"]["quality_score"] is None and m["d4"]["n_tokens"] == 0
    assert m["d0"]["fingerprint"] == m["d1"]["fingerprint"]

    groups = t["exact_dup_groups"].collect()
    assert len(groups) == 1 and groups[0]["doc_ids"] == ["d0", "d1"]

    near = {(r["doc_a"], r["doc_b"]) for r in t["near_dups"].collect()}
    assert ("d0", "d2") in near or ("d2", "d0") in near
    assert not any("d3" in p for pair in near for p in pair)
