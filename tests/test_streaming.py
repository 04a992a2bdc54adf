"""Structured Streaming ops: watermarked tumbling windows + session windows,
driven incrementally (availableNow) and checked against batch equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

import shutil

import pytest

from ba_gepris_crawler_spark.streaming import events as SE

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # the file-stream source requires a directory of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_tumbling_counts_match_batch(spark, tmp_path, events_dir):
    stream = SE.read_events_stream(spark, events_dir)
    assert stream.isStreaming
    out = SE.tumbling_counts(stream, window="5 minutes", watermark="30 minutes")
    SE.run_available_now(out, "t_tumbling", str(tmp_path / "cp1"))
    got = {
        (r.bucket_epoch, r.event_type): (r.n_events, r.avg_value)
        for r in spark.sql("select * from t_tumbling").collect()
    }
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy((F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long").alias("b"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 3).alias("a"))
    )
    want = {(r.b, r.event_type): (r.n, r.a) for r in batch.collect()}
    # availableNow + append emits only watermark-closed windows; every
    # emitted window must match the batch result exactly, and most must emit
    assert len(got) >= len(want) - 5
    for k, v in got.items():
        assert want[k] == v, k


def test_session_windows(spark, tmp_path, events_dir):
    stream = SE.read_events_stream(spark, events_dir)
    out = SE.session_windows(stream, gap="30 minutes", watermark="2 hours")
    SE.run_available_now(out, "t_sessions", str(tmp_path / "cp2"))
    rows = spark.sql("select * from t_sessions").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.end_epoch > r.start_epoch
        assert r.n_events >= 1
