"""Structured Streaming operators over the events stream.

The reference is a bounded, demand-driven stream with no event-time
semantics (SURVEY.md §2.8) — these operators are the engine's forward path
for unbounded ingestion: watermarked tumbling-window aggregation and
stateful sessionization. Batch twins (identical semantics, DuckDB-checked)
live in plans/driver_queries.py (events_tumbling_window / events_sessionize).

Tests drive these with a file source + Trigger.AvailableNow, which executes
the same incremental plan a live stream would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def read_events_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def tumbling_counts(stream: DataFrame, window: str = "5 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window counts/averages per event_type. Late rows
    beyond the watermark are dropped; state is bounded by the watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.unix_timestamp("w.start").cast("long").alias("bucket_epoch"),
            "event_type",
            "n_events",
            F.round("avg_value", 3).alias("avg_value"),
        )
    )


def session_windows(stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user via the built-in session_window
    (state closed once the watermark passes the gap)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("w.start").cast("long").alias("start_epoch"),
            F.unix_timestamp("w.end").cast("long").alias("end_epoch"),
            "n_events",
        )
    )


def run_available_now(df: DataFrame, query_name: str, checkpoint: str, output_mode: str = "append"):
    """Drain all available input with the incremental engine into a memory
    sink; returns the finished StreamingQuery."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (n_events, total_value) maintained in the state store across
    micro-batches — the arbitrary-state API the built-in windows can't
    express (e.g. per-key counters, custom eviction). Emits the cumulative
    row for every user seen in each micro-batch (update mode)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]})

    return stream.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
