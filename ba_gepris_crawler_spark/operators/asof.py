"""AS-OF join and bucketed RANGE join — custom temporal operators Spark's
DataFrame API lacks.

Semantics: each left row is matched to the LATEST right row with
right_ts <= left_ts within the same key (DuckDB `ASOF LEFT JOIN`
semantics; unmatched left rows keep nulls).

Scalable encoding: union the two sides tagged, sort within each key
partition by (ts, side) with the right side FIRST on equal timestamps, and
carry the right payload forward with last(..., ignorenulls) over an
unbounded-preceding row frame. One shuffle on the key — never a range
cross join, never per-row Python; a hot key spreads no worse than the
window itself (salt the key upstream if a single key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort the type (MapType — alone or nested — cannot
    appear in an ORDER BY; AnalysisException otherwise)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """Returns every left row + `<col><suffix>` columns holding the
    payload of the latest right row at-or-before the left timestamp.
    Ties on (key, ts) resolve right-before-left, so an equal-timestamp
    right row IS visible to the left row. When MULTIPLE right rows share
    (key, ts), the payload columns themselves are the final window
    tiebreaker (greatest payload wins), so which row's value is carried
    is stable across runs — the window order would otherwise be
    nondeterministic under Spark's unstable sort (ADVICE r2).

    ALL payload columns are carried from the SAME winning right row via a
    single struct fill: filling each column with its own
    last(ignorenulls) let a NULL in the matched row fall through to an
    OLDER row's value per column — a frankenrow stitched from different
    right rows, and a wrong non-NULL where DuckDB ASOF (the documented
    semantics) returns the matched row's NULL (review r5 ops #1)."""
    left_extras = [c for c in left.columns if c not in (key, left_ts)]
    payload_t = T.StructType(
        [T.StructField(f"{c}{suffix}", right.schema[c].dataType) for c in right_cols]
    )
    l2 = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_extras],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in right_cols],
        F.lit(None).cast(payload_t).alias("_p"),
    )
    r2 = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extras],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.struct(*[F.col(c).alias(f"{c}{suffix}") for c in right_cols]).alias("_p"),
    )
    # one window spec, payload columns as trailing tiebreakers; left rows
    # (payloads all null, nulls-first) still sort AFTER right rows on an
    # equal timestamp because _is_left dominates. All fills go through ONE
    # select over the original columns so they share a single Window
    # operator and a single, consistent sort. Non-orderable payload types
    # (maps, or structs/arrays nesting them) tie-break by
    # xxhash64(to_json(payload)) instead — Spark forbids both sorting AND
    # hashing maps directly (same map, different hashcodes), but the JSON
    # rendering of a given row is deterministic, so the carried value is
    # stable across runs and the ORDER BY stays legal.
    tiebreak = [
        F.col(f"{c}{suffix}")
        if _orderable(right.schema[c].dataType)
        else F.xxhash64(F.to_json(F.col(f"{c}{suffix}")))
        for c in right_cols
    ]
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_left", *tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l2.unionByName(r2).select(
        F.col(key),
        "_ts",
        "_is_left",
        *[F.col(c) for c in left_extras],
        # ONE atomic fill: the struct is non-null for every right row, so
        # the matched row's own NULL payload fields stay NULL instead of
        # back-filling column-by-column from older rows
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    return filled.filter(F.col("_is_left") == 1).select(
        F.col(key),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left_extras],
        *[F.col(f"_p.{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    start_col: str = "t0",
    end_col: str = "t1",
    bin_width: int = 3600,
) -> DataFrame:
    """Interval-containment join: every (point, interval) pair with
    start <= ts <= end within the same key. The naive plan is a
    conditional cross join (|points| x |intervals| per key); here each
    interval explodes to one row per covered time BIN of `bin_width`, the
    join is an equi-join on (key, bin), and the exact BETWEEN filter runs
    only on bin-collocated pairs — work scales with interval length /
    bin_width, and a point's single bin guarantees each true pair appears
    exactly once (no post-dedup). Timestamps are epoch-second longs."""
    ivl = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width), F.floor(F.col(end_col) / bin_width)
            )
        ),
    )
    pts = points.withColumn("_bin", F.floor(F.col(ts_col) / bin_width))
    return (
        pts.join(ivl, [key, "_bin"])
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("_bin")
    )
