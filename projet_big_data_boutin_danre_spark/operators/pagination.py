"""Sort / limit / offset (SURVEY.md §2.5 O1/O2).

The reference's search API sorts by relevance/time/price and paginates
with ``limit`` (default 35) + ``offset = limit*(page-1)``
(``dags/lbc/lbc/utils.py:27,98-102,185,202-205``).

Spark mapping: a global sort + LIMIT is optimized to a distributed
TakeOrderedAndProject (per-partition top-(offset+limit), merged on the
driver) — no full sort, no full shuffle. For deep pagination at scale
prefer keyset pagination (``where sort_key > last_seen``), exposed here
as ``keyset_page``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort_page(
    df: DataFrame,
    order: Sequence[Column],
    limit: int = 35,
    page: int = 1,
) -> DataFrame:
    """O1+O2: ORDER BY ... LIMIT limit OFFSET limit*(page-1).

    Uses the native LIMIT/OFFSET physical operators (Spark ≥ 3.4):
    both collapse into a single take-ordered of ``offset+limit`` rows.
    ``order`` must be a total order (include a unique tiebreak column)
    for deterministic pages.
    """
    offset = limit * (page - 1)
    out = df.orderBy(*order)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def keyset_page(
    df: DataFrame,
    sort_col: str,
    after,
    limit: int = 35,
    ascending: bool = True,
) -> DataFrame:
    """Scale path for deep pagination: seek past the last-seen key
    instead of skipping ``offset`` rows. O(limit) work regardless of
    page depth; the predicate pushes into the scan."""
    c = F.col(sort_col)
    pred = c > F.lit(after) if ascending else c < F.lit(after)
    out = df.filter(pred).orderBy(c.asc() if ascending else c.desc())
    return out.limit(limit)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_alias: str = "rnk",
) -> DataFrame:
    """Windowed top-k per key — the general form of the reference's A2
    keep-last (k=1). One exchange on the group key; rows beyond k are
    dropped before any downstream shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )
