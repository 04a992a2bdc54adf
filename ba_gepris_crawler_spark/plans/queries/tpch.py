"""Relational/TPC-H-style driver queries (aggregates, rollup/cube/pivot, windows).

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
# tpch_* — relational credibility workloads
# --------------------------------------------------------------------------

@_q(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
      round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
      round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
      round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
      round(CAST(avg(l_discount) AS DOUBLE), 4) AS avg_disc,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_q(
    "tpch_q3_top10_revenue",
    """
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3_top10_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")).select("o_orderkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_q(
    "tpch_top_customers_per_nation",
    """
    WITH rev AS (
      SELECT c_nationkey, c_custkey, round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_nationkey, c_custkey)
    SELECT n_name, c_custkey, revenue, rnk FROM (
      SELECT n_name, c_custkey, revenue,
             CAST(row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rnk
      FROM rev JOIN nation ON c_nationkey = n_nationkey)
    WHERE rnk <= 3 ORDER BY n_name, rnk
    """,
)
def tpch_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family: ranking window over a join+agg (top-3 customers/nation);
    nation is broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), "c_custkey")
    return (
        rev.join(F.broadcast(n), rev.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "revenue")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .orderBy("n_name", "rnk")
    )


@_q(
    "tpch_region_revenue",
    """
    SELECT r_name, round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def tpch_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy("r_name")
    )


@_q(
    "tpch_stats_summary",
    """
    SELECT l_returnflag,
      round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS median_qty,
      round(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90_qty,
      round(CAST(stddev_samp(l_extendedprice) AS DOUBLE), 2) AS sd_price,
      round(CAST(corr(l_quantity, l_extendedprice) AS DOUBLE), 4) AS qty_price_corr
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def tpch_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: exact interpolated percentiles
    (percentile == DuckDB quantile_cont; computed on the integer-valued
    quantity column — float-price interpolation differs in the last cent
    between engines), sample stddev, Pearson
    correlation — all single-pass grouped aggregates with map-side partial
    state (percentile state is the value multiset; at 100 TB you'd switch
    to approx_percentile's fixed-size sketch and loosen the oracle)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        )
        .orderBy("l_returnflag")
    )


@_q(
    "tpch_rollup_revenue",
    """
    SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region, nation
    """,
)
def tpch_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (region -> nation -> grand total) via grouping
    sets — partial aggregation map-side, dims broadcast."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("n_regionkey"), "r_name")
    j = (
        o.join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .join(F.broadcast(r), "n_regionkey")
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "revenue", "n_orders",
        )
        .orderBy("region", "nation")
    )


@_q(
    "tpch_pivot_status_by_priority",
    """
    SELECT o_orderpriority,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def tpch_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide cross-tab): order counts per priority pivoted by status.
    Pivot values are pinned explicitly so the plan is a single grouped
    conditional aggregate — no values-discovery pre-scan."""
    o = _t(spark, sf_dir, "orders")
    p = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(f"n_{c.lower()}") for c in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


@_q(
    "tpch_monthly_orders",
    """
    SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
           CAST(date_part('month', o_orderdate) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def tpch_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function family: calendar truncation (year/month extraction)
    over a pushed-down date filter."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("y", "m")
    )


@_q(
    "tpch_cube_counts",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def tpch_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of the two dimensions) —
    one pass, partial aggregation map-side."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
        .orderBy("status", "priority")
    )
