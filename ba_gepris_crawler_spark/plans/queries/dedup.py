"""Deduplication driver queries: exact, n-gram Jaccard, SimHash, MinHash+LSH, clusters.

Split out of plans/driver_queries.py (round 5); query bodies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.plans.queries._base import (
    _TOKS_DUCK,
    _TOKS_SPARK,
    _h60_duck,
    _h60_spark,
    _q,
    _t,
)

# --------------------------------------------------------------------------
# dedup_* — exact and near-duplicate detection (training-data pipeline)
# --------------------------------------------------------------------------

# Planted duplicates: doc_id % 10 == 0 rows share one sentinel text.
_DTEXT_DUCK = "CASE WHEN doc_id % 10 = 0 THEN 'duplicate sentinel text body' ELSE text END"
_DTEXT_SPARK = "CASE WHEN doc_id % 10 = 0 THEN 'duplicate sentinel text body' ELSE text END"


@_q(
    "dedup_exact",
    f"""
    WITH t AS (SELECT doc_id, {_DTEXT_DUCK} AS body FROM documents)
    SELECT md5(body) AS text_md5, CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM t GROUP BY 1 HAVING count(*) > 1 ORDER BY text_md5
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep min doc_id."""
    d = _t(spark, sf_dir, "documents").withColumn("body", F.expr(_DTEXT_SPARK))
    return (
        d.groupBy(F.md5("body").alias("text_md5"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .orderBy("text_md5")
    )


_SHINGLES_DUCK = """
    WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim({body}), '\\s+'), x -> x <> '') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
           FROM t, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS s(i))
"""


@_q(
    "dedup_ngram_jaccard",
    _SHINGLES_DUCK.format(body="CASE WHEN doc_id % 10 = 0 THEN 'duplicate sentinel text body extended for shingling purposes' ELSE text END")
    + """
    , sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           round(CAST(n_common * 1.0 / (sa.n + sb.n - n_common) AS DOUBLE), 6) AS jaccard
    FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram (3-shingle) Jaccard near-dup pairs >= 0.5, through the REAL
    module (operators/dedup.py ngram_jaccard_pairs -> shingles +
    verified_near_dups). The module's shingler is short-doc safe (sub-3-
    token docs yield no shingles, matching DuckDB's ascending-only
    generate_series) — the old inline copy crashed on them under ANSI mode
    because Spark's sequence(1, 0) descends to [1, 0]."""
    from ba_gepris_crawler_spark.operators.dedup import ngram_jaccard_pairs

    body = "CASE WHEN doc_id % 10 = 0 THEN 'duplicate sentinel text body extended for shingling purposes' ELSE text END"
    d = _t(spark, sf_dir, "documents").withColumn("body", F.expr(body))
    return (
        ngram_jaccard_pairs(d, text_col="body", n=3, threshold=0.5)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@_q(
    "dedup_simhash",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    h AS (SELECT doc_id, {_h60_duck('tok')} AS hv FROM tok),
    bits AS (
      SELECT doc_id, b.b AS bit,
             CASE WHEN sum(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END AS v
      FROM h, (SELECT unnest(generate_series(0, 15)) AS b) b
      GROUP BY doc_id, b.b)
    SELECT doc_id, CAST(sum(v * (1 << bit)) AS BIGINT) AS simhash16
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash through the REAL module (operators/dedup.py simhash —
    16-bit here with a portable md5 token hash injected; 64-bit xxhash64
    is the module's scale default): per-bit majority vote over token
    hashes."""
    from ba_gepris_crawler_spark.operators.dedup import simhash

    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    tok = d.select("doc_id", F.explode("toks").alias("tok"))
    h = tok.select("doc_id", F.expr(_h60_spark("tok")).alias("hv"))
    return (
        simhash(d, bits=16, hashed_tokens=h)
        .select("doc_id", F.col("simhash").alias("simhash16"))
        .orderBy("doc_id")
    )


_MINHASH_P = 2147483647
_MINHASH_FUNCS = [(2 * j + 1, 7 * j + 3) for j in range(8)]


def _minhash_cols_spark() -> list:
    cols = []
    for j, (a, b) in enumerate(_MINHASH_FUNCS):
        cols.append(F.min(F.expr(f"(({a} * hv + {b}) % {_MINHASH_P} + {_MINHASH_P}) % {_MINHASH_P}")).alias(f"m{j}"))
    return cols


@_q(
    "dedup_minhash_lsh",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
    tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM t),
    h AS (SELECT doc_id, {_h60_duck('tok')} % {_MINHASH_P} AS hv FROM tok),
    sig AS (SELECT doc_id,
      {', '.join(f'min(({a} * hv + {b}) % {_MINHASH_P}) AS m{j}' for j, (a, b) in enumerate(_MINHASH_FUNCS))}
      FROM h GROUP BY doc_id),
    bands AS (
      SELECT doc_id, 0 AS band, md5(CAST(m0 AS VARCHAR) || '_' || CAST(m1 AS VARCHAR)) AS bkey FROM sig
      UNION ALL SELECT doc_id, 1, md5(CAST(m2 AS VARCHAR) || '_' || CAST(m3 AS VARCHAR)) FROM sig
      UNION ALL SELECT doc_id, 2, md5(CAST(m4 AS VARCHAR) || '_' || CAST(m5 AS VARCHAR)) FROM sig
      UNION ALL SELECT doc_id, 3, md5(CAST(m6 AS VARCHAR) || '_' || CAST(m7 AS VARCHAR)) FROM sig),
    bsz AS (SELECT doc_id, band, bkey,
                   count(*) OVER (PARTITION BY band, bkey) AS n,
                   min(doc_id) OVER (PARTITION BY band, bkey) AS anchor
            FROM bands),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bsz a JOIN bsz b
               ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
             WHERE a.n <= 256 OR a.doc_id = a.anchor),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
    common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
               FROM cand c JOIN tok a ON a.doc_id = c.doc_a JOIN tok b ON b.doc_id = c.doc_b AND b.tok = a.tok
               GROUP BY 1, 2)
    SELECT CAST(co.doc_a AS BIGINT) AS doc_a, CAST(co.doc_b AS BIGINT) AS doc_b,
           round(CAST(n_common * 1.0 / (sa.n + sb.n - n_common) AS DOUBLE), 6) AS jaccard
    FROM common co
      JOIN sizes sa ON co.doc_a = sa.doc_id JOIN sizes sb ON co.doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.7
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (8 perms) + LSH banding (4 bands x 2 rows) through the REAL
    module (operators/dedup.py minhash_signatures + lsh_candidate_pairs +
    verified_near_dups): candidates are ALL (a<b) pairs sharing a band
    bucket — anchor-only pairing lost true near-dups whose bucket anchor
    was a band false positive (both anchor edges fail the verify stage,
    so connected components never recovers the pair) — up to the
    max_bucket=256 degenerate-bucket guard, beyond which a bucket gets
    linear anchor-star edges (one 2-row band bucket held 77% of this
    synthetic corpus; all-pairs there is O(n^2), an executor killer at
    scale). Candidates are then verified by true token Jaccard >= 0.7.
    The bucket-size rule is deterministic, so the oracle replays it; the
    portable md5 token hash is injected as a precomputed `hv` so DuckDB
    replays the identical signatures; band-key hash differences (md5 vs
    xxhash64) don't matter — only the grouping does.

    tok is persisted (it feeds the signature, both verify-join sides, and
    the size table; Spark re-runs unpersisted shared subplans). The bounded
    pair output is eagerly checkpointed so the cache can be dropped INSIDE
    this call — no lingering executor storage for the caller to clear."""
    from ba_gepris_crawler_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verified_near_dups,
    )

    d = _t(spark, sf_dir, "documents").withColumn("toks", F.expr(_TOKS_SPARK))
    tok = d.select("doc_id", F.explode("toks").alias("tok")).distinct().persist()
    h = tok.withColumn("hv", F.expr(f"{_h60_spark('tok')} % {_MINHASH_P}"))
    sig = minhash_signatures(tok, id_col="doc_id", unit_col="tok", num_perm=8, hashed_units=h)
    cand = lsh_candidate_pairs(sig, id_col="doc_id", num_perm=8, bands=4)
    pairs = verified_near_dups(cand, tok, id_col="doc_id", unit_col="tok", threshold=0.7)
    out = (
        pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    tok.unpersist()
    return out


@_q(
    "dedup_clusters",
    """
    WITH RECURSIVE e0 AS (
      SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 10 IN (0, 1, 2, 3)
      UNION ALL
      SELECT doc_id, doc_id + 2 FROM documents WHERE doc_id % 10 = 6),
    e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    reach(node, r) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.node)
    SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup clustering through the REAL module
    (operators/dedup.py connected_components — alternating large/small
    star): chains (i..i+4 for i%10=0) and skip pairs (i, i+2 for i%10=6)
    derived from doc_ids; the oracle computes components via a recursive
    CTE (transitive closure + min label). This is the step between
    near-dup pair generation and 'keep one doc per duplicate cluster'."""
    from ba_gepris_crawler_spark.operators.dedup import connected_components

    d = _t(spark, sf_dir, "documents")
    chain = d.filter(F.col("doc_id") % 10 < 4).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
    )
    skip = d.filter(F.col("doc_id") % 10 == 6).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 2).alias("doc_b")
    )
    comp = connected_components(chain.unionByName(skip), "doc_a", "doc_b")
    return comp.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component_id").cast("bigint").alias("component_id"),
    ).orderBy("doc_id")
