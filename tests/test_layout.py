"""Z-order layout (sources/layout.py): Morton key exactness against a
pure-Python reference, and the actual data-skipping payoff measured
from parquet footer statistics — every z-ordered column gets bounded
per-file ranges, where a single-column sort leaves the other column
full-width per file."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.sources import layout


def test_zorder_key_matches_reference(spark):
    # 4x4 grid, bits=2: the textbook Z curve
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = layout.with_zorder_key(df, ["x", "y"], bits=2)
    got = {(r.x, r.y): r["__z"] for r in out.collect()}
    # min/max normalization over 0..3 at bits=2 is the identity
    ref = layout.zorder_reference(rows, bits=2)
    for (x, y), z in zip(rows, ref):
        assert got[(x, y)] == z
    # spot-check the canonical curve: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    assert (got[(0, 0)], got[(1, 0)], got[(0, 1)], got[(1, 1)]) == (
        0, 1, 2, 3,
    )


def test_zorder_key_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, 5), (7, 5)], "x long, y long"
    )
    out = {(r.x, r.y): r["__z"] for r in layout.with_zorder_key(
        df, ["x", "y"], bits=4
    ).collect()}
    # constant y: zero span -> every y cell is 0; NULL x -> cell 0,
    # same key as the minimum x
    assert out[(None, 5)] == out[(3, 5)]
    assert out[(7, 5)] > out[(3, 5)]


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of a column from parquet footer stats —
    exactly the metadata a scan planner prunes with."""
    import glob

    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        spans.append((mn, mx))
    return spans


def test_zorder_bounds_every_column_per_file(spark, tmp_path):
    """The payoff claim, measured: with 16 files over a 64x64 grid,
    z-order gives BOTH columns per-file ranges far below full width;
    a plain sort by x leaves y full-width in every file."""
    rows = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    zpath = str(tmp_path / "zord")
    layout.write_zordered(df, zpath, ["x", "y"], n_files=16)
    spath = str(tmp_path / "xsort")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # same data both ways
    assert spark.read.parquet(zpath).count() == 64 * 64

    def widths(path, col):
        return [
            mx - mn for mn, mx in _file_ranges(path, col) if mn is not None
        ]

    # x-sorted: x prunes well but y is full-width (63) in every file
    assert max(widths(spath, "y")) == 63
    # z-ordered: BOTH columns bounded — 16 files over a 2-D curve
    # gives ~range/sqrt(16) per side; allow 2x slack for cell edges
    assert max(widths(zpath, "x")) <= 2 * (64 // 4)
    assert max(widths(zpath, "y")) <= 2 * (64 // 4)

    # pruning arithmetic a planner would do: fraction of files whose
    # x-range AND y-range intersect a small 2-D box
    def files_hit(path, x_lo, x_hi, y_lo, y_hi):
        xr = _file_ranges(path, "x")
        yr = _file_ranges(path, "y")
        return sum(
            1
            for (xmn, xmx), (ymn, ymx) in zip(xr, yr)
            if xmx >= x_lo and xmn <= x_hi and ymx >= y_lo and ymn <= y_hi
        )

    assert files_hit(zpath, 0, 7, 0, 7) < files_hit(spath, 0, 7, 0, 7)


def test_zorder_rejects_bad_shapes(spark):
    import pytest

    with pytest.raises(ValueError, match="at least 2"):
        layout.zorder_key([F.lit(1).cast("long")], bits=4)
    with pytest.raises(ValueError, match="exceeds a long"):
        layout.zorder_key(
            [F.lit(1).cast("long")] * 4, bits=16
        )
