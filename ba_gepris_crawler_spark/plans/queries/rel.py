"""Relational utility driver queries: dictionary encoding, string functions, set ops.

Split out of plans/driver_queries.py (round 5); query bodies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ba_gepris_crawler_spark.plans.queries._base import (
    _q,
    _t,
)

@_q(
    "rel_dictionary_encode",
    """
    WITH dict AS (SELECT p_brand, row_number() OVER (ORDER BY p_brand) AS brand_id
                  FROM (SELECT DISTINCT p_brand FROM part))
    SELECT CAST(brand_id AS BIGINT) AS brand_id, p_brand,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM part JOIN dict USING (p_brand)
    GROUP BY brand_id, p_brand ORDER BY brand_id
    """,
)
def dq_dictionary_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: distinct names -> deterministic surrogate ids (reference uses a
    driver-side autoincrement, SqliteAccess.scala:111-130; here a
    row_number over the sorted distinct set — same contract, distributed)."""
    p = _t(spark, sf_dir, "part")
    dict_df = (
        p.select("p_brand").distinct()
        .withColumn("brand_id", F.row_number().over(Window.orderBy("p_brand")).cast("bigint"))
    )
    return (
        p.join(F.broadcast(dict_df), "p_brand")
        .groupBy("brand_id", "p_brand")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("brand_id")
    )


@_q(
    "rel_string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           CAST(strlen(c_name) AS BIGINT) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, '#', '-') AS name_dashed,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS key_padded
    FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey
    """,
)
def rel_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family: case, length, substring, replace, position,
    padding — all JVM-side expressions inside one codegen stage."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
        F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("key_padded"),
    ).orderBy("c_custkey")


@_q(
    "rel_intersect_except",
    """
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
    b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
    SELECT 'both' AS bucket, CAST(count(*) AS BIGINT) AS n FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
    UNION ALL
    SELECT 'open_only', CAST(count(*) AS BIGINT) FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
    ORDER BY bucket
    """,
)
def rel_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (INTERSECT / EXCEPT distinct) over customer key sets."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k")).distinct()
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k")).distinct()
    both = a.intersect(b).agg(F.count(F.lit(1)).alias("n")).select(F.lit("both").alias("bucket"), "n")
    only = a.exceptAll(b).agg(F.count(F.lit(1)).alias("n")).select(F.lit("open_only").alias("bucket"), "n")
    return both.unionByName(only).orderBy("bucket")
