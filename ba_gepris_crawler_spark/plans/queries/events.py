"""Event-stream driver queries: tumbling/session/rolling windows, as-of/range joins, navigation.

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
# events_* — event-stream shapes (batch equivalents of the streaming ops)
# --------------------------------------------------------------------------

@_q(
    "events_tumbling_window",
    """
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_epoch, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(avg(value) AS DOUBLE), 3) AS avg_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation (batch twin of the streaming
    window op in streaming/events.py)."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("bigint")
    return (
        ev.groupBy(bucket.alias("bucket_epoch"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 3).alias("avg_value"))
        .orderBy("bucket_epoch", "event_type")
    )


@_q(
    "events_sessionize",
    """
    WITH o AS (SELECT user_id, floor(epoch(ts))::BIGINT AS te,
                      lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_te
               FROM events),
    f AS (SELECT user_id, te,
                 CASE WHEN prev_te IS NULL OR te - prev_te > 1800 THEN 1 ELSE 0 END AS brk
          FROM o),
    s AS (SELECT user_id, te,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY te
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM f)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(te) AS BIGINT) AS start_epoch, CAST(max(te) AS BIGINT) AS end_epoch
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag -> break flags -> running sum
    -> per-session aggregates. The batch twin of stateful streaming
    sessionization."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").cast("bigint").alias("te"), "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.withColumn("prev_te", F.lag("te").over(w))
    f = o.withColumn(
        "brk", F.when(F.col("prev_te").isNull() | (F.col("te") - F.col("prev_te") > 1800), 1).otherwise(0)
    )
    ws = Window.partitionBy("user_id").orderBy("te").rowsBetween(Window.unboundedPreceding, 0)
    s = f.withColumn("session_id", F.sum("brk").over(ws).cast("bigint"))
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("te").alias("start_epoch"),
            F.max("te").alias("end_epoch"),
        )
        .orderBy("user_id", "session_id")
    )


@_q(
    "events_rolling_avg",
    """
    SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
           round(CAST(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
             AS rolling_avg_5,
           round(CAST(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
             AS running_sum
    FROM events ORDER BY event_id
    """,
)
def events_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded window frames: per-user 5-event rolling average + running
    sum (ROWS frames, deterministic tiebreak on event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), 4).alias("rolling_avg_5"),
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias("running_sum"),
    ).orderBy("event_id")


@_q(
    "events_asof_join",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    r AS (SELECT user_id, ts, event_id AS purchase_id,
                 CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
          FROM events WHERE event_type = 'purchase')
    SELECT CAST(l.event_id AS BIGINT) AS event_id, CAST(l.user_id AS BIGINT) AS user_id,
           CAST(floor(epoch(l.ts)) AS BIGINT) AS click_epoch,
           CAST(r.purchase_id AS BIGINT) AS purchase_id,
           round(CAST(r.value AS DOUBLE), 3) AS purchase_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join through the REAL custom operator (operators/asof.py):
    each click matched to the user's latest at-or-before purchase. Spark
    has no native as-of join; the operator encodes it as union + ordered
    window with an atomic struct fill — one key shuffle, no range cross
    join. The oracle is DuckDB's native ASOF LEFT JOIN. Every 7th
    purchase's value is NULLed on both sides: the matched row's own NULL
    must come through as NULL (a per-column ignorenulls fill back-filled
    it from an OLDER purchase — review r5 ops #1)."""
    from ba_gepris_crawler_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("value"),
    )
    out = asof_join(clicks, purchases, key="user_id", right_cols=("purchase_id", "value"))
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("click_epoch"),
        F.col("purchase_id_asof").cast("bigint").alias("purchase_id"),
        F.round("value_asof", 3).alias("purchase_value"),
    ).orderBy("event_id")


@_q(
    "events_range_join",
    """
    WITH s AS (SELECT event_id AS signup_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t0
               FROM events WHERE event_type = 'signup'),
    c AS (SELECT event_id AS click_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tc
          FROM events WHERE event_type = 'click')
    SELECT CAST(s.signup_id AS BIGINT) AS signup_id, CAST(c.click_id AS BIGINT) AS click_id,
           CAST(c.tc - s.t0 AS BIGINT) AS secs_after_signup
    FROM s JOIN c ON s.user_id = c.user_id AND c.tc BETWEEN s.t0 AND s.t0 + 7200
    ORDER BY signup_id, click_id
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join through the REAL custom operator
    (operators/asof.py range_join): clicks within 2 h of each signup by
    the same user. The operator bins intervals so the join is an
    equi-join on (key, bin) + exact BETWEEN — never a conditional cross
    join. The oracle is DuckDB's native range join (IEJoin)."""
    from ba_gepris_crawler_spark.operators.asof import range_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("t0"),
    ).withColumn("t1", F.col("t0") + 7200)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("tc"),
    )
    out = range_join(clicks, signups, key="user_id", ts_col="tc", start_col="t0", end_col="t1")
    return out.select(
        "signup_id", "click_id", (F.col("tc") - F.col("t0")).cast("bigint").alias("secs_after_signup")
    ).orderBy("signup_id", "click_id")


@_q(
    "events_first_last_nav",
    """
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(min_by(event_id, ts) AS BIGINT) AS first_event_id,
           CAST(max_by(event_id, ts) AS BIGINT) AS last_event_id
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def events_first_last_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation aggregates: first/last event per user by time order
    (min_by/max_by — the single-pass alternative to first_value/
    last_value windows; (user_id, ts) is unique so no tiebreak needed)."""
    ev = _t(spark, sf_dir, "events")
    key = F.col("ts")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by("event_id", key).cast("bigint").alias("first_event_id"),
            F.max_by("event_id", key).cast("bigint").alias("last_event_id"),
        )
        .orderBy("user_id")
    )
