"""Final-artifact export (plans/export.py): CSV quoting contract, nested
column dropping (reference toCsvRow), and unique-key dedup
(SqliteDBCreator unique indexes)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from ba_gepris_crawler_spark.plans.export import UNIQUE_KEYS, dedup_for_export, export_tables


def _projects(spark):
    rows = [
        ("p1", "Title A", ["X", "Y"]),
        ("p1", "Title A dup", ["X"]),  # violates unique(project_id)
        ("p2", 'He said "hi"', []),
    ]
    return spark.createDataFrame(rows, "project_id string, title string, subject_areas array<string>")


def test_unique_key_dedup(spark):
    out = dedup_for_export("projects", _projects(spark))
    assert out.count() == 2
    assert out.filter(F.col("project_id") == "p1").count() == 1


def test_parquet_export_keeps_nested(spark, tmp_path):
    counts = export_tables({"projects": _projects(spark)}, str(tmp_path), fmt="parquet")
    assert counts == {"projects": 2}
    back = spark.read.parquet(str(tmp_path / "projects"))
    assert "subject_areas" in back.columns


def test_csv_export_flat_and_quoted(spark, tmp_path):
    counts = export_tables({"projects": _projects(spark)}, str(tmp_path), fmt="csv")
    assert counts == {"projects": 2}
    files = glob.glob(str(tmp_path / "projects" / "part-*.csv"))
    body = "".join(open(f).read() for f in files)
    # nested Seq-column dropped (DTOs.scala:35 toCsvRow contract)
    assert "subject_areas" not in body
    # QUOTE_ALL: every field quoted, embedded quotes escaped
    assert '"project_id","title"' in body
    assert '"He said ""hi"""' in body


def test_tables_without_key_pass_through(spark):
    df = spark.range(5).select(F.col("id").alias("x"))
    assert dedup_for_export("no_such_table", df).count() == 5
    assert set(UNIQUE_KEYS) >= {"projects", "persons", "institutions"}
