"""Range (interval-containment) join — pair each point with every
interval containing it, per key.

Spark plans a raw ``ts BETWEEN start AND end`` theta-join as
BroadcastNestedLoopJoin (or a cartesian per key): O(points ×
intervals), hopeless at scale. The distributed-idiomatic shape is the
BINNED equi-join:

1. bucket time into fixed bins of ``bin_width`` seconds,
2. each point lands in exactly one bin; each interval is exploded to
   the bins it overlaps (``sequence`` — bounded fan-out when
   ``bin_width`` ≳ typical interval length),
3. equi-join on (key, bin) — a plain shuffled/broadcast hash join —
   then filter exact containment.

Because a point has exactly one bin, each qualifying (point,
interval) pair is produced exactly once: no post-join dedup. Cost:
one hash join on (key, bin) + interval fan-out of
``len/bin_width + 1`` rows per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bin_width_sec: int = 3600,
) -> DataFrame:
    """Inner join: rows pairing every ``points`` row with every
    ``intervals`` row of the same ``key`` where
    ``start <= ts <= end`` (inclusive bounds). Columns: all point
    columns + all interval columns (names must not collide)."""
    p = points.withColumn(
        "__bin", F.floor(F.col(ts).cast("long") / bin_width_sec)
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("long") / bin_width_sec),
                F.floor(F.col(end).cast("long") / bin_width_sec),
            )
        ),
    )
    return (
        p.join(i, on=[key, "__bin"], how="inner")
        .filter(F.col(ts).between(F.col(start), F.col(end)))
        .drop("__bin")
    )
