"""Local replica of the driver's correctness gate: run each registered
driver query in Spark AND its DuckDB oracle on the same parquet tables,
compare row multisets + column names exactly."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> tuple[bool, str]:
    """Returns (ok, message). Mirrors the driver: sort columns by name,
    compare row multisets."""
    sp_cols = sorted(spark_df.columns)
    sp_rows = sorted(tuple(_norm(r[c]) for c in sp_cols) for r in spark_df.collect())
    res = con.execute(oracle_sql)
    du_cols_raw = [d[0] for d in res.description]
    du_cols = sorted(du_cols_raw)
    idx = [du_cols_raw.index(c) for c in du_cols]
    du_rows = sorted(tuple(_norm(row[i]) for i in idx) for row in res.fetchall())
    if sp_cols != du_cols:
        return False, f"column mismatch: spark={sp_cols} duck={du_cols}"
    if len(sp_rows) != len(du_rows):
        return False, f"row count mismatch: spark={len(sp_rows)} duck={len(du_rows)}"
    if sp_rows != du_rows:
        diff_a = [r for r in sp_rows if r not in du_rows][:3]
        diff_b = [r for r in du_rows if r not in sp_rows][:3]
        return False, f"value mismatch: spark-only={diff_a} duck-only={diff_b}"
    return True, f"ok ({len(sp_rows)} rows)"
