"""Incremental / watermark processing (SURVEY.md §2.9 ST1-ST4, §2.4 A3).

The reference hand-rolls a micro-batch stream: hourly cron + a JSON
high-watermark file (``dags/lib/lbc_fetcher.py:43-57,92-98,134-137``) —
fetch newest-first, drop events ≤ last watermark, advance watermark to
``max(event_date)``. Two re-expressions here:

1. **Batch-incremental** (this module): a one-row watermark state
   table + ``filter(ts > wm)`` — same semantics, works on any engine
   run, scales trivially (the filter pushes into the scan / partition
   pruning when the table is date-partitioned).
2. **Structured Streaming** (stream_dedup.py): ``readStream`` +
   ``withWatermark`` + ``dropDuplicates`` for the late/duplicate rules
   (ST3) with managed checkpointing.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_watermark(spark: SparkSession, state_path: str) -> dt.datetime | None:
    """ST2: load the high watermark (None on first run — the
    reference's missing-state default, ``lbc_fetcher.py:48-57``)."""
    try:
        rows = spark.read.parquet(state_path).collect()
    except Exception:
        return None
    return rows[0]["last_fetched"] if rows else None


def write_watermark(df_batch: DataFrame, ts_col: str, state_path: str) -> None:
    """A3+K5: advance the watermark to max(ts) of the processed batch
    and persist — a one-row aggregate, map-side combined."""
    (
        df_batch.agg(F.max(F.col(ts_col)).alias("last_fetched"))
        .write.mode("overwrite")
        .parquet(state_path)
    )


def incremental_batch(
    df: DataFrame, ts_col: str, watermark: dt.datetime | None
) -> DataFrame:
    """ST2/O3: keep only rows strictly newer than the watermark (the
    reference drops ``date <= last_fetched``, ``lbc_fetcher.py:92-94``).
    Set semantics replace the reference's ordered early-break scan —
    and the predicate prunes partitions/row-groups at scale."""
    if watermark is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(watermark))
