"""Embedding similarity driver queries: cosine top-k, IVF, hyperplane LSH.

Split out of plans/driver_queries.py (round 5); query bodies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.plans.queries._base import (
    _q,
    _t,
)

# --------------------------------------------------------------------------
# emb_* — similarity search over the embedding column
# --------------------------------------------------------------------------

_DOT_DUCK = (
    "list_aggregate(list_transform(list_zip({a}, {b}), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
)
_NORM_DUCK = "sqrt(list_aggregate(list_transform({a}, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))"
_DOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"
_NORM_SPARK = "sqrt(aggregate({a}, cast(0 as double), (acc, y) -> acc + cast(y as double) * cast(y as double)))"


@_q(
    "emb_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    s AS (SELECT q.qid, e.vec_id,
            round(CAST({_DOT_DUCK.format(a='e.embedding', b='q.qe')}
              / ({_NORM_DUCK.format(a='e.embedding')} * {_NORM_DUCK.format(a='q.qe')}) AS DOUBLE), 4) AS cosine
          FROM embeddings e, q WHERE e.vec_id <> q.qid)
    SELECT qid, vec_id, cosine, rnk FROM (
      SELECT qid, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
      FROM s) WHERE rnk <= 10
    ORDER BY qid, rnk
    """,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: broadcast the query set,
    JVM-side fold for the dot product (zip_with/aggregate — no Python)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    cos = F.round(
        F.expr(_DOT_SPARK.format(a="embedding", b="qe"))
        / (F.expr(_NORM_SPARK.format(a="embedding")) * F.expr(_NORM_SPARK.format(a="qe"))),
        4,
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        pairs.select("qid", "vec_id", cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .orderBy("qid", "rnk")
    )


@_q(
    "emb_ivf_assign",
    f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % 50 = 0),
    s AS (SELECT e.vec_id, c.cid,
            round(CAST({_DOT_DUCK.format(a='e.embedding', b='c.ce')}
              / ({_NORM_DUCK.format(a='e.embedding')} * {_NORM_DUCK.format(a='c.ce')}) AS DOUBLE), 4) AS cosine
          FROM embeddings e, c),
    best AS (SELECT vec_id, cid, cosine,
               row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, cid) AS rn FROM s)
    SELECT cid AS centroid_id, CAST(count(*) AS BIGINT) AS n_assigned,
           round(CAST(avg(cosine) AS DOUBLE), 3) AS avg_cosine
    FROM best WHERE rn = 1 GROUP BY cid ORDER BY cid
    """,
)
def emb_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse quantization: assign every vector to its nearest
    centroid (the scale path for ANN — search only the probed cell)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c = e.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    pairs = e.crossJoin(F.broadcast(c))
    cos = F.round(
        F.expr(_DOT_SPARK.format(a="embedding", b="ce"))
        / (F.expr(_NORM_SPARK.format(a="embedding")) * F.expr(_NORM_SPARK.format(a="ce"))),
        4,
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "cid")
    best = (
        pairs.select("vec_id", "cid", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        best.groupBy(F.col("cid").alias("centroid_id"))
        .agg(F.count("*").alias("n_assigned"), F.round(F.avg("cosine"), 3).alias("avg_cosine"))
        .orderBy("centroid_id")
    )


_LSH_BITS_DUCK = " + ".join(
    "(CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1), i -> embedding[i] * "
    f"(CASE WHEN ('0x' || substr(md5('{p}_' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 "
    f"THEN 1.0 ELSE -1.0 END)), 'sum') >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(8)
)


@_q(
    "emb_lsh_bucket_pairs",
    f"""
    WITH sk AS (SELECT vec_id, CAST({_LSH_BITS_DUCK} AS BIGINT) AS lsh_sketch FROM embeddings)
    SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
           CAST(a.lsh_sketch AS BIGINT) AS sketch
    FROM sk a JOIN sk b ON a.lsh_sketch = b.lsh_sketch AND a.vec_id < b.vec_id
    ORDER BY vec_a, vec_b
    """,
)
def emb_lsh_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH candidate pairs through the REAL module
    (operators/similarity.py portable_hyperplane_sketch +
    sketch_bucket_pairs): 8 sign bits from md5-parity +-1 hyperplanes,
    ALL (a<b) pairs within each sketch bucket (anchor-only pairing missed
    pairs where neither vector is the bucket min — review r5). The oracle
    replays the identical double-precision fold and hash in DuckDB."""
    from ba_gepris_crawler_spark.operators.similarity import (
        portable_hyperplane_sketch,
        sketch_bucket_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sk = portable_hyperplane_sketch(emb, n_planes=8)
    return sketch_bucket_pairs(sk).orderBy("vec_a", "vec_b")


@_q(
    "emb_lsh_near_dups",
    f"""
    WITH sk AS (SELECT vec_id, CAST({_LSH_BITS_DUCK} AS BIGINT) AS lsh_sketch FROM embeddings),
    cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
             FROM sk a JOIN sk b ON a.lsh_sketch = b.lsh_sketch AND a.vec_id < b.vec_id)
    SELECT CAST(c.vec_a AS BIGINT) AS vec_a, CAST(c.vec_b AS BIGINT) AS vec_b,
           round(CAST({_DOT_DUCK.format(a='ea.embedding', b='eb.embedding')}
             / ({_NORM_DUCK.format(a='ea.embedding')} * {_NORM_DUCK.format(a='eb.embedding')}) AS DOUBLE), 4) AS cosine
    FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b
    WHERE {_DOT_DUCK.format(a='ea.embedding', b='eb.embedding')}
          / ({_NORM_DUCK.format(a='ea.embedding')} * {_NORM_DUCK.format(a='eb.embedding')}) >= 0.3
    ORDER BY vec_a, vec_b
    """,
)
def emb_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup SCALE path through the REAL module: hyperplane
    sketch -> all within-bucket candidate pairs -> exact cosine verify over
    candidates only (operators/similarity.py verify_pairs_cosine). The
    brute-force emb_neardup_pairs is the bounded-slice baseline; this is
    the shape that survives 100 TB (no all-pairs join anywhere)."""
    from ba_gepris_crawler_spark.operators.similarity import (
        portable_hyperplane_sketch,
        sketch_bucket_pairs,
        verify_pairs_cosine,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sk = portable_hyperplane_sketch(emb, n_planes=8)
    cand = sketch_bucket_pairs(sk).select("vec_a", "vec_b")
    out = verify_pairs_cosine(cand, emb, threshold=0.3)
    return out.select("vec_a", "vec_b", F.round("cosine", 4).alias("cosine")).orderBy("vec_a", "vec_b")


@_q(
    "emb_neardup_pairs",
    f"""
    WITH n AS (SELECT vec_id, embedding, {_NORM_DUCK.format(a='embedding')} AS nrm FROM embeddings WHERE vec_id < 200)
    SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
           round(CAST({_DOT_DUCK.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) AS DOUBLE), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_DOT_DUCK.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) > 0.4
    ORDER BY vec_a, vec_b
    """,
)
def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (pairwise on
    a bounded slice; the LSH/IVF variants above are the scale path)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200).select(
        "vec_id", "embedding", F.expr(_NORM_SPARK.format(a="embedding")).alias("nrm")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos_raw = F.expr(_DOT_SPARK.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("cos_raw", cos_raw)
        .filter(F.col("cos_raw") > 0.4)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


@_q(
    "emb_ivf_probe_topk",
    f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id >= 8 AND vec_id < 13),
    ac AS (SELECT e.vec_id, e.embedding, ct.cid,
             {_DOT_DUCK.format(a='e.embedding', b='ct.ce')}
               / ({_NORM_DUCK.format(a='e.embedding')} * {_NORM_DUCK.format(a='ct.ce')}) AS ccos
           FROM embeddings e, cent ct),
    assign AS (SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        FROM ac) WHERE rn = 1),
    qp AS (SELECT q.qid, q.qe, ct.cid,
             {_DOT_DUCK.format(a='q.qe', b='ct.ce')}
               / ({_NORM_DUCK.format(a='q.qe')} * {_NORM_DUCK.format(a='ct.ce')}) AS ccos
           FROM q, cent ct),
    probes AS (SELECT qid, qe, cid FROM (
        SELECT qid, qe, cid, row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, cid) AS rn
        FROM qp) WHERE rn <= 2),
    cand AS (SELECT p.qid, a.vec_id,
               {_DOT_DUCK.format(a='a.embedding', b='p.qe')}
                 / ({_NORM_DUCK.format(a='a.embedding')} * {_NORM_DUCK.format(a='p.qe')}) AS cosine
             FROM probes p JOIN assign a USING (cid)
             WHERE a.vec_id <> p.qid)
    SELECT qid, vec_id, round(CAST(cosine AS DOUBLE), 4) AS cosine, rnk FROM (
      SELECT qid, vec_id, cosine,
             CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
      FROM cand) WHERE rnk <= 5
    ORDER BY qid, rnk
    """,
)
def emb_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF ANN search through the REAL module path
    (operators/similarity.py ivf_index + ivf_topk): coarse-quantize the
    corpus to 8 centroid cells, probe the nprobe=2 nearest cells per query,
    exact rank inside the probed cells. The scale story: the candidate join
    shrinks from |corpus|x|queries| to |cell|x|queries|, and at real scale
    the index is written partitioned BY cell for partition pruning."""
    from ba_gepris_crawler_spark.operators.similarity import ivf_index, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    index = ivf_index(emb, centroids)
    out = ivf_topk(index, centroids, queries, k=5, nprobe=2)
    return out.select(
        "qid", "vec_id", F.round("cosine", 4).alias("cosine"), F.col("rnk").cast("bigint").alias("rnk")
    ).orderBy("qid", "rnk")
