"""Bucketed-table support: pre-shuffle once at write time, join
shuffle-free forever after.

At 100 TB, a recurring fact⋈fact equi-join (e.g. events⋈events,
orders⋈lineitem) shuffles both sides on every run. Writing both
tables bucketed by the join key with the same bucket count makes the
join a zip of co-numbered buckets: Catalyst plans SortMergeJoin with
NO Exchange on either side (asserted in tests/test_plan_shapes.py).
The shuffle is paid once, at ingest.

Bucketing requires the session catalog (``saveAsTable``) — bucket
metadata lives in the table definition, not the parquet files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the join's
    per-task Sort at read time."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket specs this plans exchange-free."""
    return spark.table(left_table).join(
        spark.table(right_table), on=list(on), how=how
    )
