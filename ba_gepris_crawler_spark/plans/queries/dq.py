"""Data-quality driver queries (reference Q1-Q9 workload + liveness/audit).

Split out of plans/driver_queries.py (round 5); query bodies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.plans.queries._base import (
    _h60_duck,
    _h60_spark,
    _q,
    _t,
)

# --------------------------------------------------------------------------
# dq_* — the reference DQ workload shapes (SURVEY.md §2.11) over TPC-H
# --------------------------------------------------------------------------

@_q(
    "dq_referential_integrity",
    """
    WITH present AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 <> 0)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orphans
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM present)
    GROUP BY 1 ORDER BY 1
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/Q5 shape: relation rows whose key is missing from the primary
    table (left_anti), counted per status."""
    orders = _t(spark, sf_dir, "orders")
    present = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 != 0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return (
        orders.join(present, "o_custkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orphans"))
        .orderBy("o_orderstatus")
    )


@_q(
    "dq_semantic_date_order",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           round(CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) * 1.0 / count(*) AS DOUBLE), 6) AS violation_rate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def dq_semantic_date_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: semantic rule 'ship after order' violation ratio."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    viol = F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0))
    return j.agg(
        F.count("*").alias("n_checked"),
        viol.alias("n_violations"),
        F.round(viol / F.count("*"), 6).alias("violation_rate"),
    )


@_q(
    "dq_schema_coverage",
    """
    SELECT * FROM (
      SELECT DISTINCT 'events' AS src_table, event_type AS name FROM events
      UNION
      SELECT DISTINCT 'documents' AS src_table, source AS name FROM documents)
    ORDER BY src_table, name
    """,
)
def dq_schema_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: distinct 'field names' per source, sorted union."""
    ev = _t(spark, sf_dir, "events").select(F.lit("events").alias("src_table"), F.col("event_type").alias("name")).distinct()
    dc = _t(spark, sf_dir, "documents").select(F.lit("documents").alias("src_table"), F.col("source").alias("name")).distinct()
    return ev.unionByName(dc).distinct().orderBy("src_table", "name")


@_q(
    "dq_population_coverage",
    """
    WITH t AS (SELECT count(*) AS total FROM orders)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(count(*) * 1.0 / (SELECT total FROM t) AS DOUBLE), 6) AS coverage
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def dq_population_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: per-class counts vs population total — ONE scan: the total
    is summed from the (tiny) per-class aggregate and broadcast back,
    instead of a driver-side count() baked in as a literal (which costs an
    extra full scan + a collect in the hot path)."""
    o = _t(spark, sf_dir, "orders")
    per_class = o.groupBy("o_orderstatus").agg(F.count("*").alias("n_orders"))
    total = per_class.agg(F.sum("n_orders").alias("_total"))
    return (
        per_class.crossJoin(F.broadcast(total))
        .select(
            "o_orderstatus",
            "n_orders",
            F.round(F.col("n_orders") / F.col("_total"), 6).alias("coverage"),
        )
        .orderBy("o_orderstatus")
    )


@_q(
    "dq_year_validity",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           round(CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 ELSE 0 END) * 1.0 / count(*) AS DOUBLE), 6) AS dq_value
    FROM orders
    """,
)
def dq_year_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape: regex syntactic-validity ratio (rlike find semantics)."""
    o = _t(spark, sf_dir, "orders")
    valid = F.sum(F.when(F.col("o_orderpriority").rlike("^[0-9]-"), 1).otherwise(0))
    return o.agg(
        F.count("*").alias("n_checked"),
        valid.alias("n_valid"),
        F.round(valid / F.count("*"), 6).alias("dq_value"),
    )


# --------------------------------------------------------------------------
# round-2 additions: the remaining SURVEY.md §2 query shapes
# --------------------------------------------------------------------------

@_q(
    "dq_taxonomy_consistency",
    """
    WITH sa AS (SELECT 'sa' || CAST(doc_id % 40 AS VARCHAR) AS subject_area FROM documents),
    official AS (SELECT 'sa' || CAST(unnest(generate_series(0, 19)) AS VARCHAR) AS subject_area)
    SELECT CAST((SELECT count(*) FROM sa) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_unmatched,
           round(CAST(1.0 - count(*) * 1.0 / (SELECT count(*) FROM sa) AS DOUBLE), 6) AS dq_value
    FROM sa WHERE subject_area NOT IN (SELECT subject_area FROM official)
    """,
)
def dq_taxonomy_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4/J2: project subject areas anti-joined against the official taxonomy
    (broadcast — 213 rows in the reference, README.md:134; Scala twin
    ProjectSubjectAreasHaveMatchesInOfficialSubjectAreaSet.scala:22-47,
    R twin dataquality-checks.Rmd:236-255). The official set is broadcast;
    the anti-join is the O(n·m) reference loop done hash-side."""
    sa = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("sa"), (F.col("doc_id") % 40).cast("string")).alias("subject_area")
    )
    official = spark.createDataFrame([(f"sa{i}",) for i in range(20)], "subject_area string").withColumn(
        "_m", F.lit(1)
    )
    # ONE scan: broadcast left join + conditional aggregate replaces the
    # driver-side count() literal (count + anti-join was two scans).
    unmatched = F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0))
    return (
        sa.join(F.broadcast(official), "subject_area", "left")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            unmatched.cast("bigint").alias("n_unmatched"),
            F.round(1.0 - unmatched / F.count(F.lit(1)), 6).alias("dq_value"),
        )
    )


@_q(
    "dq_source_evidence_coverage",
    """
    SELECT CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_ids,
           CAST(count(*) AS BIGINT) AS n_without_evidence,
           round(CAST(1.0 - count(*) * 1.0 / (SELECT count(*) FROM customer) AS DOUBLE), 6) AS coverage
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def dq_source_evidence_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: id list anti-joined against the evidence table (reference checks
    file-existence per id, dataquality-checks.Rmd:194-223; in Spark the
    evidence is a table, so existence = left_anti)."""
    c = _t(spark, sf_dir, "customer")
    ev = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    # ONE scan of each table: deduped evidence keys left-joined +
    # conditional aggregate (was: count() literal + anti-join = two
    # customer scans and a driver collect in the hot path).
    missing = F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0))
    return c.join(ev, "c_custkey", "left").agg(
        F.count(F.lit(1)).alias("n_ids"),
        missing.cast("bigint").alias("n_without_evidence"),
        F.round(1.0 - missing / F.count(F.lit(1)), 6).alias("coverage"),
    )


@_q(
    "dq_sample_audit",
    """
    WITH agg AS (SELECT o_custkey, count(*) AS n_orders,
                        round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_spent
                 FROM orders GROUP BY o_custkey)
    SELECT c_custkey, c_name, n_name, r_name,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(total_spent, 0.0) AS DOUBLE) AS total_spent
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey
    LEFT JOIN region ON n_regionkey = r_regionkey
    LEFT JOIN agg ON c_custkey = o_custkey
    WHERE c_custkey IN (1, 7, 42, 99, 123)
    ORDER BY c_custkey
    """,
)
def dq_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7/J4: pinned-sample audit via a chained left-join denormalization
    (dataquality-checks.Rmd:401-412: filter isin -> 5-way left-join -> sort).
    Dims broadcast; the fact-side agg happens before the join."""
    sample = [1, 7, 42, 99, 123]
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey").isin(sample))
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("n_regionkey"), "r_name")
    agg = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(sample))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
    )
    return (
        c.join(F.broadcast(n), "c_nationkey", "left")
        .join(F.broadcast(r), "n_regionkey", "left")
        .join(agg, "c_custkey", "left")
        .select(
            "c_custkey", "c_name", "n_name", "r_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce(F.col("total_spent"), F.lit(0.0)).cast("double").alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@_q(
    "dq_hash_sample",
    f"""
    WITH s AS (SELECT * FROM orders WHERE {_h60_duck("CAST(o_orderkey AS VARCHAR)")} % 100 < 5)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_sampled,
           round(CAST(avg(o_totalprice) AS DOUBLE), 2) AS avg_price
    FROM s GROUP BY 1 ORDER BY 1
    """,
)
def dq_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (the reproducible alternative to
    RNG-based TABLESAMPLE for DQ audits): keep rows whose key hash lands
    in a fixed 5% band — the same rows on every engine and every run, so
    audit samples are re-examinable. Aggregated per class."""
    o = _t(spark, sf_dir, "orders")
    keep = F.expr(f"{_h60_spark('cast(o_orderkey as string)')} % 100") < 5
    return (
        o.filter(keep)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("o_orderstatus")
    )


@_q(
    "dq_url_liveness",
    """
    WITH f AS (SELECT doc_id,
      CASE WHEN doc_id % 13 = 0 THEN 404 WHEN doc_id % 13 = 1 THEN 503 ELSE 200 END AS status,
      CASE WHEN doc_id % 9 = 0 THEN 'Error: The requested page was not found on this server'
           ELSE text END AS body
      FROM documents)
    SELECT CASE
        WHEN status = 200 AND contains(lower(body), 'requested page was not found') THEN 'false_200'
        WHEN status = 200 THEN 'live'
        WHEN status >= 400 AND status < 500 THEN 'client_error'
        WHEN status >= 500 THEN 'server_error'
        ELSE 'other' END AS liveness,
      CAST(count(*) AS BIGINT) AS n_urls
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def dq_url_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL liveness probe through the REAL module (plans/dq.py
    liveness_class — dataquality-checks.Rmd:484-570): classifies fetch
    outcomes incl. the reference's false-200 caveat, where a dead GEPRIS
    resource answers 200 with a 'requested page was not found' body."""
    from ba_gepris_crawler_spark.plans.dq import liveness_class

    f = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, 404)
        .when(F.col("doc_id") % 13 == 1, 503)
        .otherwise(200)
        .alias("status"),
        F.when(
            F.col("doc_id") % 9 == 0,
            F.lit("Error: The requested page was not found on this server"),
        )
        .otherwise(F.col("text"))
        .alias("body"),
    )
    return (
        f.groupBy(liveness_class("status", "body").alias("liveness"))
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .orderBy("liveness")
    )


@_q(
    "dq_staleness",
    """
    WITH h AS (
      SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
             'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
             CAST(doc_id % 4 AS INT) AS rnd
      FROM documents
      UNION ALL
      SELECT 'u' || CAST(doc_id AS VARCHAR), 'h' || CAST(doc_id % 5 AS VARCHAR), 6
      FROM documents WHERE doc_id % 3 = 0),
    m AS (SELECT *, max(rnd) OVER (PARTITION BY url) AS mx FROM h),
    cur AS (SELECT url, host, 8 - rnd AS age FROM m WHERE rnd = mx)
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(round(avg(age), 3) AS DOUBLE) AS avg_age,
           CAST(max(age) AS INT) AS max_age,
           CAST(sum(CASE WHEN age > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
           CAST(round(sum(CASE WHEN age > 3 THEN 1 ELSE 0 END) * 1.0 / count(*), 3)
                AS DOUBLE) AS stale_frac
    FROM cur GROUP BY host ORDER BY host
    """,
)
def dq_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness report over the CURRENT corpus (the ops view a
    continuously-recrawling engine answers daily): resolve each URL to its
    newest observation (plans/round_loop.latest_version, the current_tables
    kernel), then per-host age statistics + the stale fraction past a
    threshold. Fixture: every URL observed once at round doc_id%4; every
    third URL re-observed at round 6; clock now=8, stale = age > 3. One
    shuffle on url (resolve) + one metadata-sized agg on host. Beyond the
    reference (one-shot crawl: everything is round-0 stale forever)."""
    from ba_gepris_crawler_spark.plans.round_loop import latest_version

    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string")).alias("host")
    h0 = d.select(url, host, (F.col("doc_id") % 4).cast("int").alias("_round"))
    h1 = d.filter(F.col("doc_id") % 3 == 0).select(
        url, host, F.lit(6).cast("int").alias("_round")
    )
    cur = latest_version(
        h0.unionByName(h1).withColumn("last_round", F.col("_round")), ["url"]
    ).withColumn("age", F.lit(8) - F.col("last_round"))
    stale = F.sum(F.when(F.col("age") > 3, 1).otherwise(0))
    return (
        cur.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.round(F.avg("age"), 3).cast("double").alias("avg_age"),
            F.max("age").cast("int").alias("max_age"),
            stale.cast("bigint").alias("n_stale"),
            F.round(stale / F.count(F.lit(1)), 3).cast("double").alias("stale_frac"),
        )
        .orderBy("host")
    )
