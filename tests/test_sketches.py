"""Mergeable HLL sketch layer + approx quantiles: the persistable
incremental-cardinality pattern (per-partition sketches → lossless
rollup, no history rescan) and the bounded-memory percentile
companion."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import sketches as sk
from projet_big_data_boutin_danre_spark.operators import text as text_ops


def test_hll_sketches_exact_at_small_cardinality(spark):
    df = spark.createDataFrame(
        [(d, f"v{i % 7}") for d in ("a", "b") for i in range(50)],
        "grp string, v string",
    )
    out = {
        r.grp: r.approx_distinct
        for r in sk.estimate_cardinality(
            sk.cardinality_sketches(df, "grp", "v"), "grp"
        ).collect()
    }
    assert out == {"a": 7, "b": 7}


def test_hll_sketch_merge_is_lossless_and_persistable(spark, tmp_path):
    """The actual lake pattern: per-day sketches written to parquet,
    re-read, merged across days — estimate equals a single sketch
    over the unioned raw data (sketch algebra, not approximation
    stacking)."""
    day1 = spark.createDataFrame(
        [("en", f"u{i}") for i in range(40)], "lang string, v string"
    )
    day2 = spark.createDataFrame(
        [("en", f"u{i}") for i in range(20, 60)]  # overlaps day1
        + [("fr", f"w{i}") for i in range(10)],
        "lang string, v string",
    )
    p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    sk.cardinality_sketches(day1, "lang", "v").write.parquet(p1)
    sk.cardinality_sketches(day2, "lang", "v").write.parquet(p2)
    # rollup over re-read binary sketch rows — no raw-data rescan
    both = spark.read.parquet(p1).unionByName(spark.read.parquet(p2))
    rolled = {
        r.lang: r.approx_distinct
        for r in sk.estimate_cardinality(both, "lang").collect()
    }
    direct = {
        r.lang: r.approx_distinct
        for r in sk.estimate_cardinality(
            sk.cardinality_sketches(day1.unionByName(day2), "lang", "v"),
            "lang",
        ).collect()
    }
    assert rolled == direct
    assert rolled["en"] == 60 and rolled["fr"] == 10  # exact when tiny


def test_hll_sketch_partial_aggregation_plan(spark):
    """The sketch aggregate must plan with map-side partial
    aggregation (two HashAggregate/ObjectHashAggregate levels), like
    any mergeable aggregate — that's the property that bounds shuffle
    volume at 100 TB."""
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("string").alias("v")
    )
    agg = sk.cardinality_sketches(df, "g", "v")
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Aggregate") >= 2  # partial + final


def test_length_quantiles_approx_within_rank_bound(spark):
    rows = [(f"l{i % 2}", "x" * (i + 1)) for i in range(400)]
    df = spark.createDataFrame(rows, "lang string, text string")
    exact = {
        r.lang: (r.p50, r.p90, r.p99)
        for r in text_ops.length_quantiles(df, "text", "lang").collect()
    }
    approx = {
        r.lang: (r.p50, r.p90, r.p99)
        for r in text_ops.length_quantiles_approx(
            df, "text", "lang"
        ).collect()
    }
    # 200 values/group, accuracy 10k -> rank error < 1 value; approx
    # returns an actual data value, exact interpolates: within one
    # neighbor gap (values are 2 apart per group)
    for g in exact:
        for e, a in zip(exact[g], approx[g]):
            assert abs(e - a) <= 2.0


def test_length_histogram_bins_and_null_handling(spark):
    df = spark.createDataFrame(
        [
            ("en", "x" * 10),   # bin 0
            ("en", "x" * 70),   # bin 1
            ("en", "x" * 75),   # bin 1
            ("en", "x" * 200),  # bin 3 (bin 2 unoccupied -> absent)
            ("en", None),       # excluded
            ("fr", "x" * 64),   # bin 1 exactly at the boundary
        ],
        "lang string, text string",
    )
    out = {
        r.lang: (r.hist, r.n_bins)
        for r in text_ops.length_histogram(
            df, "text", "lang", bin_width=64
        ).collect()
    }
    # bin-ordered CSV, unoccupied bins absent, NULL text excluded
    assert out["en"] == ("0:1,1:2,3:1", 3)
    assert out["fr"] == ("1:1", 1)


def test_length_histogram_partial_aggregation_plan(spark):
    """The (group, bin) count must partial-aggregate map-side — the
    property that makes the shuffle carry occupied bins, not docs."""
    df = spark.range(500).select(
        (F.col("id") % 2).cast("string").alias("lang"),
        F.col("id").cast("string").alias("text"),
    )
    agg = text_ops.length_histogram(df, "text", "lang")
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
