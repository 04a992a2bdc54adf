"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force baseline — broadcast the query set, JVM-side
  zip_with/aggregate fold, per-query row_number window. Exact.
- ivf_index/ivf_topk: IVF-style coarse quantization — assign every vector
  to its nearest centroid once (the index build), then search only the
  nprobe closest cells per query. The 100 TB path: the expensive crossJoin
  shrinks from |corpus| x |queries| to |cell| x |queries|.
- random_hyperplane_lsh: sign-bit sketch over deterministic pseudo-random
  hyperplanes (seeded hash arithmetic, no RNG state) for bucketed
  candidate generation.

All exact math is double-precision folds in Catalyst; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"
NORM = "sqrt(aggregate({a}, cast(0 as double), (acc, y) -> acc + cast(y as double) * cast(y as double)))"


def _cosine(a: str, b: str) -> F.Column:
    """Cosine similarity, NULL when either vector has zero norm OR the
    result is NaN. Zero norm: an all-zero embedding (a routine artifact
    of failed encodes / padding) would otherwise make the division a hard
    DIVIDE_BY_ZERO under ANSI mode (the Spark 4 default) and abort the
    whole job. NaN: one NaN component (the other failed-encode artifact)
    yields cosine = NaN, which Spark orders ABOVE every real double — it
    sailed through isNotNull filters, ranked rnk=1 for EVERY query, and
    passed `>= threshold` as a confirmed near-dup (review r5 ops #2).
    NULL matches what DuckDB's division returns on the zero edge, so the
    oracle twins agree; threshold filters (NULL >= t is NULL) and the
    top-k rankers drop both edge classes."""
    denom = F.expr(NORM.format(a=a)) * F.expr(NORM.format(a=b))
    cos = F.when(denom != 0, F.expr(DOT.format(a=a, b=b)) / denom)
    return F.when(~F.isnan(cos), cos)  # isnan(NULL) is false: NULL passes through


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id_col: str = "qid", q_vec_col: str = "qe",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (queries broadcast).
    Self-matches (same id) are excluded."""
    pairs = corpus.crossJoin(F.broadcast(queries)).filter(F.col(id_col) != F.col(q_id_col))
    cos = _cosine(vec_col, q_vec_col).alias("cosine")
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), id_col)
    return (
        pairs.select(q_id_col, id_col, cos)
        .filter(F.col("cosine").isNotNull())  # zero-norm rows never rank
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def ivf_index(
    corpus: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    c_id_col: str = "cid", c_vec_col: str = "ce",
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid. The result should
    be persisted (and at real scale, written partitioned BY centroid so a
    probe reads only its cells' files — partition pruning does the rest)."""
    pairs = corpus.crossJoin(F.broadcast(centroids))
    w = Window.partitionBy(id_col).orderBy(F.col("cosine").desc(), c_id_col)
    return (
        pairs.select(id_col, vec_col, c_id_col, _cosine(vec_col, c_vec_col).alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, c_id_col)
    )


def ivf_topk(
    index: DataFrame, centroids: DataFrame, queries: DataFrame, k: int = 10, nprobe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    c_id_col: str = "cid", c_vec_col: str = "ce",
    q_id_col: str = "qid", q_vec_col: str = "qe",
) -> DataFrame:
    """Search only the nprobe nearest cells per query."""
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        q_id_col, q_vec_col, c_id_col, _cosine(q_vec_col, c_vec_col).alias("ccos")
    )
    wq = Window.partitionBy(q_id_col).orderBy(F.col("ccos").desc(), c_id_col)
    probes = qc.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe).select(
        q_id_col, q_vec_col, c_id_col
    )
    cand = index.join(probes, c_id_col).filter(
        # exclude self-matches like the exact cosine_topk baseline: an
        # in-corpus query's own vector sits in its cell at cosine 1.0 and
        # always took rnk=1, burning one of the k slots (review r5 ops #4)
        F.col(id_col) != F.col(q_id_col)
    )  # partition-pruned cell scan at scale
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), id_col)
    return (
        cand.select(q_id_col, id_col, _cosine(vec_col, q_vec_col).alias("cosine"))
        .filter(F.col("cosine").isNotNull())  # zero-norm rows never rank
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def write_ivf_index(index: DataFrame, path: str) -> None:
    """Persist the IVF index partitioned BY centroid cell — the layout that
    makes probe queries cheap at scale: a probe touching nprobe cells reads
    only those cells' files (Hive-style partition pruning on cid)."""
    index.write.mode("overwrite").partitionBy("cid").parquet(path)


def ivf_topk_from_store(
    spark, path: str, centroids: DataFrame, queries: DataFrame, k: int = 10, nprobe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
    c_id_col: str = "cid", c_vec_col: str = "ce",
    q_id_col: str = "qid", q_vec_col: str = "qe",
    many_queries: bool = False,
) -> DataFrame:
    """Probe search against a written cell-partitioned index. The probed
    cell set never transits the driver (VERDICT r3 #6): the broadcast join
    on the partition column triggers DYNAMIC partition pruning — Spark
    derives the probed cell ids from the broadcast at runtime and skips
    every other cell's files (a `dynamicpruning` PartitionFilter in the
    plan). At millions of concurrent queries pass many_queries=True: the
    probe side (which carries the query vectors) is too big to broadcast,
    so the join runs co-keyed on the cell column instead — same result,
    file skipping traded for the shuffle the data size forces anyway.

    REQUIRES spark.sql.optimizer.dynamicPartitionPruning.enabled=true (the
    Spark default): with DPP off (or declined by pruningHasBenefit) the
    result is still correct but every cell's files are scanned — the
    guaranteed prune is the point of the cell-partitioned layout, so a
    disabled optimizer is surfaced as a warning here and pinned by the
    plan assertion in tests/test_training_ops.py (``dynamicpruning`` in
    the executed plan)."""
    if not many_queries and spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
    ).lower() != "true":
        import warnings

        warnings.warn(
            "dynamicPartitionPruning is disabled: ivf_topk_from_store will "
            "scan every index cell instead of only the probed ones",
            RuntimeWarning,
            stacklevel=2,
        )
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        q_id_col, q_vec_col, c_id_col, _cosine(q_vec_col, c_vec_col).alias("ccos")
    )
    wq = Window.partitionBy(q_id_col).orderBy(F.col("ccos").desc(), c_id_col)
    probes = qc.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe).select(
        q_id_col, q_vec_col, c_id_col
    )
    index = spark.read.parquet(path)
    cand = index.join(probes if many_queries else F.broadcast(probes), c_id_col).filter(
        F.col(id_col) != F.col(q_id_col)  # no self-matches, like cosine_topk
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), id_col)
    return (
        cand.select(q_id_col, id_col, _cosine(vec_col, q_vec_col).alias("cosine"))
        .filter(F.col("cosine").isNotNull())  # zero-norm rows never rank
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def portable_hyperplane_sketch(
    df: DataFrame, n_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane sign sketch with +-1 weights from a PORTABLE md5
    parity hash (w[p][i] = +1 iff md5('p_i') is even) — bit-identical
    replayable in DuckDB, so the sketch is oracle-checkable end to end.
    random_hyperplane_sketch (xxhash64 weights, real-valued hyperplanes)
    stays the scale path; bucketing semantics are the same."""
    bit_exprs = []
    for p in range(n_planes):
        w = (
            f"CASE WHEN cast(conv(substring(md5(concat('{p}_', cast(i as string))), 1, 15), 16, 10) as bigint) % 2 = 0 "
            "THEN cast(1.0 as double) ELSE cast(-1.0 as double) END"
        )
        dot = (
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1),"
            f" (x, i) -> cast(x as double) * ({w})),"
            " cast(0 as double), (acc, v) -> acc + v)"
        )
        bit_exprs.append(f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END) * {1 << p}")
    return df.select(id_col, F.expr(" + ".join(bit_exprs)).cast("long").alias("lsh_sketch"))


def sketch_bucket_pairs(sketch: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(vec_a, vec_b, sketch) candidate pairs: ALL (a<b) pairs of vectors
    sharing a sketch bucket, via a co-keyed self-join on the sketch.

    Not (min-id anchor, member) pairs: anchor-only pairing silently missed
    every near-dup pair where neither vector is the bucket's min id (e.g.
    bucket {a,b,c} where cosine(b,c)=0.95 but the anchor a is a hash false
    positive far from both — (b,c) was never tested and verify_pairs_cosine
    cannot recover it). Quadratic only within one bucket; each vector has
    exactly ONE sketch, so every pair appears once — no distinct needed."""
    a = sketch.select(F.col(id_col).alias("vec_a"), "lsh_sketch")
    b = sketch.select(F.col(id_col).alias("vec_b"), "lsh_sketch")
    return (
        a.join(b, "lsh_sketch")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.col("lsh_sketch").alias("sketch"))
    )


def verify_pairs_cosine(
    pairs: DataFrame, vectors: DataFrame, threshold: float = 0.8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine over CANDIDATE pairs only (the verify stage after
    sketch bucketing): two id-joins + a JVM fold, never an all-pairs
    cross join. (vec_a, vec_b, cosine) above the threshold."""
    va = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_ea"))
    vb = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_eb"))
    return (
        pairs.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cosine", _cosine("_ea", "_eb"))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def random_hyperplane_sketch(
    df: DataFrame, n_planes: int = 16, id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42
) -> DataFrame:
    """sign(v . h_p) bits from deterministic pseudo-hyperplanes:
    h_p[i] = hash(seed, p, i) mapped to [-1, 1). No RNG state, executor-pure."""
    bit_exprs = []
    for p in range(n_planes):
        dot = (
            f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1),"
            f" (x, i) -> cast(x as double) * (pmod(xxhash64({seed + p}, i), 1000003) / 500001.5 - 1.0)),"
            " cast(0 as double), (acc, v) -> acc + v)"
        )
        bit_exprs.append(f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END) * {1 << p}")
    return df.select(id_col, F.expr(" + ".join(bit_exprs)).cast("long").alias("lsh_sketch"))
