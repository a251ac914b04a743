"""Mergeable sketch layer: persistable cardinality state for
incremental corpora.

``approx_count_distinct`` answers "how many distinct now?" in one
pass, but its state dies with the query — re-answering after a day of
ingestion rescans ALL history. The scale-correct design persists the
SKETCH, not the answer: per-partition (e.g. per-day, per-source) HLL
sketches are tiny binary blobs (``2^lgk`` registers ≈ KBs) that merge
LOSSLESSLY — union of day-sketches == sketch of the unioned days —
so any rollup (trailing 30 days, per-source lifetime, whole-corpus)
is an aggregation over sketch rows, never a rescan of 100 TB of text.

Built on Spark's Apache DataSketches bindings (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` — SQL functions since
Spark 3.5, JVM-side, map-side partial aggregation). Engine extension
beyond the reference (no sketch surface there, SURVEY §2); estimates
are engine-specific so this layer is pytest-verified (exact at small
cardinality, merge-consistency properties), not oracle-hashed —
the same stance as ``corpus_cardinality``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cardinality_sketches",
    "merge_cardinality_sketches",
    "estimate_cardinality",
]


def cardinality_sketches(
    df: DataFrame,
    by: Sequence[str] | str,
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per group: ``(by..., hll binary)``. ``lgk`` is
    the DataSketches log2(registers) knob — 12 → 4 Ki registers,
    ~±1.6% relative standard error, a few KB per group. The sketch
    column is a plain binary column: write it to parquet next to the
    partition it summarizes and the lake carries its own incremental
    distinct-count state."""
    keys = [by] if isinstance(by, str) else list(by)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(int(lgk))).alias("hll")
    )


def merge_cardinality_sketches(
    sketches: DataFrame,
    by: Sequence[str] | str,
) -> DataFrame:
    """Merge sketch rows to one sketch per (coarser) group — e.g.
    per-(day, source) sketches → per-source. Lossless: merging is the
    sketch algebra's union, so estimates after any merge tree equal
    the estimate of one sketch over all the raw data. Input rows are
    KBs each; this aggregation is trivially cheap at any corpus
    size."""
    keys = [by] if isinstance(by, str) else list(by)
    return sketches.groupBy(*keys).agg(
        F.hll_union_agg("hll").alias("hll")
    )


def estimate_cardinality(
    sketches: DataFrame,
    by: Sequence[str] | str,
) -> DataFrame:
    """Read estimates out of (optionally pre-merged) sketch rows:
    ``(by..., approx_distinct bigint)``. Rows already one-per-group
    pass through ``merge_cardinality_sketches`` harmlessly (union of
    one sketch is itself)."""
    merged = merge_cardinality_sketches(sketches, by)
    keys = [by] if isinstance(by, str) else list(by)
    return merged.select(
        *keys,
        F.hll_sketch_estimate("hll").cast("bigint").alias(
            "approx_distinct"
        ),
    )
