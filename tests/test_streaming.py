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


def test_running_user_totals_stateful(spark, tmp_path):
    """applyInPandasWithState: state must carry across micro-batches —
    events split into two file chunks, streamed one file per trigger; the
    final cumulative row per user must equal the batch aggregate."""
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tmp_path / "chunks"
    d.mkdir()
    src.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(d / "c0"))
    src.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(d / "c1"))
    import glob, shutil as sh
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        sh.copy(f, flat / f"file-{i}.parquet")

    stream = SE.read_events_stream(spark, str(flat), max_files_per_trigger=1)
    out = SE.running_user_totals(stream)
    q = SE.run_available_now(out, "t_state", str(tmp_path / "cp3"), output_mode="update")
    assert q.lastProgress is not None

    rows = spark.sql("select * from t_state").collect()
    # multiple emissions per user (one per micro-batch it appears in);
    # the LAST emission carries the cumulative total
    last = {}
    for r in rows:
        last[r.user_id] = (r.n_events, r.total_value)
    batch = src.groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("t")
    )
    want = {r.user_id: (r.n, r.t) for r in batch.collect()}
    assert set(last) == set(want)
    for u, (n, t) in want.items():
        assert last[u][0] == n, u
        assert abs(last[u][1] - t) < 1e-4, u
    # and state genuinely spanned micro-batches: some user must have been
    # emitted more than once
    from collections import Counter
    c = Counter(r.user_id for r in rows)
    assert max(c.values()) >= 2
