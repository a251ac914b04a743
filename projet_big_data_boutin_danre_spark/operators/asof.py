"""As-of (time-travel) join — match each left row to the most recent
right row at or before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive
formulations don't scale: a range theta-join explodes to every
(left, right) pair per key before picking the max, and a per-left-row
subquery is O(n) scans. The distributed-idiomatic shape used here is
union + forward-fill:

1. union left and right rows into one frame tagged by side,
2. one window pass per key ordered by (ts, side) carrying the last
   non-null right values forward (``last(..., ignorenulls=True)``),
3. keep the left rows.

Cost: ONE shuffle on the key (the window partition), no row blowup —
the same shape as any windowed aggregation at 100 TB. Right rows sort
before left rows at equal timestamps, so the match is inclusive
(right_ts <= left_ts), matching SQL ``ASOF JOIN ... ON l.ts >= r.ts``
semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: all ``left`` columns plus ``value_cols`` from
    the latest ``right`` row with ``right_ts <= left_ts`` on the same
    ``key`` (null when no such row). Right rows should be unique per
    (key, right_ts) for a deterministic match."""
    left_cols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        "__side",
        *left_cols,
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
