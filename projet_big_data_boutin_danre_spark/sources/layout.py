"""Z-order (Morton-curve) file layout for multi-column data skipping —
the lakehouse write-path optimization that makes parquet min/max
row-group statistics useful for MORE THAN ONE column at once.

Why it matters at 100 TB: a table sorted by one column clusters that
column's values per file (so a filter on it prunes files via footer
stats) but leaves every other column's per-file range full-width — a
filter on a second column still reads everything. Interleaving the
bits of k normalized columns into one sort key (the Z-/Morton curve)
bounds EVERY participating column's range per file to roughly
``range / n_files^(1/k)``: each filtered column prunes, at the cost of
none of them pruning perfectly. This is the public technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``; here it is plain Column algebra
over a plain parquet write — no table format required.

Shape: one tiny min/max aggregation (1 row, broadcast back), a
map-only key computation (static bit-twiddling expression, whole-stage
codegen), then ``repartitionByRange`` on the key (range exchange with
sampled boundaries — the standard distributed sort, no single
reducer) + ``sortWithinPartitions``. Everything is integer-exact and
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _norm_to_bits(c: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Linear-scale a numeric column into [0, 2^bits) as a long —
    min/max normalization (deterministic, SQL-expressible; swap in
    quantile-based binning when the distribution is pathologically
    skewed and equal-width cells would collapse). NULLs map to cell 0
    (they sort first, clustering together — which is what file
    pruning wants)."""
    span = (mx - mn).cast("double")
    scaled = F.when(
        span > 0,
        F.floor(
            (c.cast("double") - mn.cast("double"))
            / span
            * F.lit(float(2**bits - 1))
            + F.lit(0.5)
        ),
    ).otherwise(F.lit(0))
    return F.coalesce(scaled.cast("long"), F.lit(0))


def zorder_key(
    norm_cols: list[Column], bits: int = 16
) -> Column:
    """Interleave the low ``bits`` bits of k already-normalized long
    columns into one Morton key: bit b of column i lands at position
    ``b*k + i``. A static expression of shiftleft/and/or terms —
    stays inside whole-stage codegen, no UDF. k*bits must fit a long
    (≤ 63)."""
    k = len(norm_cols)
    if k < 2:
        raise ValueError("zorder needs at least 2 columns")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(norm_cols):
        for b in range(bits):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * k + i))
    return out


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "__z"
) -> DataFrame:
    """Attach the Morton key for ``cols``: one 1-row min/max
    aggregation (broadcast back — bounded model state, like a range
    sampler's boundaries), then the map-only interleave."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    norm = [
        _norm_to_bits(
            F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in cols
    ]
    drop = [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return joined.withColumn(key_col, zorder_key(norm, bits)).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of ``cols``: range-partition on the Morton key (sampled
    boundaries — a distributed sort, never one reducer), sort within
    each file so row-group stats are tight, drop the key from the
    stored schema. Every column in ``cols`` then prunes files/row
    groups under selective filters (verified against parquet footer
    stats in tests/test_layout.py)."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_reference(values: list[tuple[int, ...]], bits: int = 16) -> list[int]:
    """Driver-side pure-Python Morton reference for tests: input is
    ALREADY-normalized per-column cell ids."""
    out = []
    k = len(values[0]) if values else 0
    for tup in values:
        z = 0
        for i, v in enumerate(tup):
            for b in range(bits):
                z |= ((v >> b) & 1) << (b * k + i)
        out.append(z)
    return out
