"""Unit tests for the reference-parity cleaning semantics
(SURVEY.md §5.4: A2 keep-last tie-break, P6 fillna-vs-null, P7 TZ
parsing, location normalization)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import cleaning


def test_coerce_numeric_maps_bad_and_missing_to_zero(spark):
    df = spark.createDataFrame(
        [("1", "12.5"), ("2", "N/A"), ("3", ""), ("4", None)], ["id", "price"]
    )
    out = {
        r["id"]: r["p"]
        for r in df.select("id", cleaning.coerce_numeric("price").alias("p")).collect()
    }
    # pandas to_numeric(errors='coerce').fillna(0): bad parse AND null → 0
    assert out == {"1": 12.5, "2": 0.0, "3": 0.0, "4": 0.0}


def test_coerce_timestamp_null_on_failure_and_tz(spark):
    df = spark.createDataFrame(
        [
            ("1", "2025-03-01T10:00:00+02:00"),
            ("2", "not-a-date"),
            ("3", None),
        ],
        ["id", "d"],
    )
    out = {
        r["id"]: r["t"]
        for r in df.select("id", cleaning.coerce_timestamp("d").alias("t")).collect()
    }
    # session TZ is UTC → +02:00 shifts back two hours
    assert out["1"] == dt.datetime(2025, 3, 1, 8, 0, 0)
    assert out["2"] is None
    assert out["3"] is None


def test_keep_last_dedup_is_deterministic_keep_last(spark):
    rows = [
        Row(id=1, seq=1, title="old"),
        Row(id=1, seq=3, title="new"),
        Row(id=1, seq=2, title="mid"),
        Row(id=2, seq=1, title="only"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["id"]: r["title"]
        for r in cleaning.keep_last_dedup(df, ["id"], "seq").collect()
    }
    assert out == {1: "new", 2: "only"}
    # ties broken by the tiebreak column, not partition luck
    tie = spark.createDataFrame(
        [Row(id=1, seq=1, k=5, title="a"), Row(id=1, seq=1, k=9, title="b")]
    )
    got = cleaning.keep_last_dedup(tie, ["id"], "seq", tiebreak=["k"]).collect()
    assert got[0]["title"] == "b"


def test_normalize_location_union_type(spark):
    df = spark.createDataFrame(
        [
            ("1", '{"city": "Paris", "zipcode": "75001", "lat": 48.85, "lng": 2.35}'),
            ("2", "N/A"),
            ("3", None),
        ],
        ["id", "location_json"],
    )
    out = {r["id"]: r["location"] for r in cleaning.normalize_location(df).collect()}
    assert out["1"]["zipcode"] == "75001"
    assert out["2"] is None  # the reference's "N/A" string → null struct
    assert out["3"] is None


def test_map_from_attribute_list_and_unwrap(spark):
    df = spark.createDataFrame(
        [
            Row(
                id=1,
                attrs=[
                    Row(key="square", value="42"),
                    Row(key="rooms", value="3"),
                ],
                price=[1999.0],
            )
        ]
    )
    out = df.select(
        cleaning.map_from_attribute_list("attrs").alias("m"),
        cleaning.unwrap_scalar("price").alias("p"),
    ).collect()[0]
    assert out["m"] == {"square": "42", "rooms": "3"}
    assert out["p"] == 1999.0


def test_cents_to_euros(spark):
    df = spark.createDataFrame([(1, 12345), (2, 0), (3, None)], ["id", "cents"])
    out = {
        r["id"]: r["e"]
        for r in df.select("id", cleaning.cents_to_euros("cents").alias("e")).collect()
    }
    assert out == {1: 123.45, 2: None, 3: None}


def test_has_cols(spark):
    df = spark.createDataFrame([(1, "a")], ["x", "y"])
    assert cleaning.has_cols(df, ["x"])
    assert not cleaning.has_cols(df, ["x", "zzz"])


def test_within_file_keep_last_uses_element_position(spark, tmp_path):
    """ADVICE r4: duplicates of an id INSIDE one file with equal dates
    must resolve by element position (the reference's pandas
    keep='last' on concat order), not arbitrarily — read_raw_ad_files
    carries __file_pos precisely for this tiebreak."""
    import json

    ads = [
        {"list_id": 9, "subject": "first", "price_cents": [100],
         "date": "2025-01-15 09:00:00", "location": "N/A", "attributes": []},
        {"list_id": 9, "subject": "second", "price_cents": [200],
         "date": "2025-01-15 09:00:00", "location": "N/A", "attributes": []},
    ]
    (tmp_path / "annonces_090000.json").write_text(json.dumps(ads))
    raw = cleaning.read_raw_ad_files(spark, str(tmp_path / "*.json"))
    fmt = cleaning.format_ads_from_files(raw)
    out = cleaning.keep_last_dedup(
        fmt, ["id"], "__ingest_file", tiebreak=["__file_pos"]
    ).collect()
    assert len(out) == 1
    assert out[0]["title"] == "second"


def test_corrupt_raw_ad_file_fails_loudly(spark, tmp_path):
    """A malformed ingest file must fail the run (in-plan raise_error
    naming the file), not silently contribute zero rows: from_json on
    garbage is NULL and posexplode(NULL) would otherwise just drop the
    whole file's ads."""
    (tmp_path / "annonces_090000.json").write_text('{"truncated": ')
    with pytest.raises(Exception, match="unparseable raw ad file"):
        cleaning.read_raw_ad_files(spark, str(tmp_path / "*.json")).collect()


def test_profile_table_counts_and_bounds(spark):
    from projet_big_data_boutin_danre_spark.operators.cleaning import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 7.5), (None, None, None)],
        "id long, cat string, val double",
    )
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "cat", "val"}
    r = prof["id"]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (4, 1, 3)
    assert (r.min_str, r.max_str) == ("1", "3")
    assert (prof["cat"].n_distinct, prof["cat"].n_nulls) == (2, 1)
    assert prof["val"].min_str == "5.0" and prof["val"].max_str == "7.5"
    # distinct-column cap: columns past the cap report NULL distincts
    capped = {
        r.col_name: r.n_distinct
        for r in profile_table(df, max_distinct_cols=1).collect()
    }
    assert capped["id"] == 3 and capped["cat"] is None and capped["val"] is None


def test_profile_table_approx_mode_no_expand(spark):
    """approx=True swaps exact countDistinct (Expand node — a k+1×
    row multiplication of the scan) for HLL++ sketches that merge
    map-side in the same single aggregation: the 100 TB profile."""
    from projet_big_data_boutin_danre_spark.operators.cleaning import (
        profile_table,
    )

    from projet_big_data_boutin_danre_spark.operators.cleaning import (
        _profile_aggs,
    )

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 7.5), (None, None, None)],
        "id long, cat string, val double",
    )

    def plan(approx, which):
        stats, nd = _profile_aggs(df, 64, approx)
        agg = df.agg(*(stats if which == "stats" else nd))
        return agg._jdf.queryExecution().executedPlan().toString()

    # exact mode: distincts live in their own count-only aggregation —
    # Expand is there, but with all-long buffers it must stay in
    # HashAggregate (string min/max buffers in the same plan would
    # demote the grouped partial stages to SortAggregate and sort the
    # k+1×-expanded scan twice)
    nd_plan = plan(False, "nd")
    assert "Expand" in nd_plan
    assert "SortAggregate" not in nd_plan and "HashAggregate" in nd_plan
    # the stats pass never expands, in either mode
    assert "Expand" not in plan(False, "stats")
    assert "Expand" not in plan(True, "stats")  # HLL++ sketches ride along
    assert _profile_aggs(df, 64, True)[1] == []  # approx: one pass total
    prof = {r.col_name: r for r in profile_table(df, approx=True).collect()}
    # HLL++ at default rsd is exact at these cardinalities
    assert prof["id"].n_distinct == 3
    assert prof["cat"].n_distinct == 2
    assert prof["val"].n_distinct == 2
    # non-distinct stats identical to exact mode
    assert (prof["id"].n_rows, prof["id"].n_nulls) == (4, 1)
    assert (prof["id"].min_str, prof["id"].max_str) == ("1", "3")


def test_data_checks_all_kinds(spark):
    from projet_big_data_boutin_danre_spark.operators.cleaning import (
        data_checks,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "OK"),
            (2, "a", 20.0, "OK"),
            (2, None, 999.0, "BAD"),
            (3, "b", None, "OK"),
        ],
        "id long, grp string, val double, status string",
    )
    out = {
        (r.check, r.target): (r.n_violations, r.sample_key)
        for r in data_checks(
            df,
            unique=[["id"], ["id", "grp"]],
            non_null=["grp"],
            accepted={"status": ["OK"]},
            ranges={"val": (0.0, 100.0)},
        ).collect()
    }
    assert out[("unique", "id")] == (1, "2")        # id=2 twice
    assert out[("unique", "id|grp")][0] == 0        # (id,grp) is unique
    assert out[("not_null", "grp")] == (1, None)
    assert out[("accepted_values", "status")] == (1, "BAD")
    # NULL val is not a range violation; 999 is, and is the sample
    assert out[("in_range", "val")] == (1, "999.0")


def test_data_checks_clean_table_and_single_pass_plan(spark):
    from projet_big_data_boutin_danre_spark.operators.cleaning import (
        data_checks,
    )

    df = spark.createDataFrame(
        [(1, "x"), (2, "y")], "id long, name string"
    )
    out = data_checks(
        df,
        unique=[["id"]],
        non_null=["id", "name"],
        accepted={"name": ["x", "y"]},
    )
    assert out.filter("n_violations > 0").count() == 0
    # all row-level checks ride ONE aggregation (one scan); each
    # uniqueness check adds exactly one groupBy job — asserted by
    # the operator's shape, spot-checked here via its output size
    assert out.count() == 4


def test_coerce_numeric_control_char_trim_matches_reference(spark):
    """r19 regression pin (hypothesis found '1\\x1f' in the full-suite
    run): Spark's string->double cast trims EVERY char <= 0x20 from
    both ends; the reference contract (pandas to_numeric == DuckDB
    TRY_CAST, verified char-by-char) trims only real whitespace
    [\\t\\n\\x0b\\f\\r ]. Boundary control chars outside that set must
    coerce to the fill, while the whitespace set (and interior
    failures) keep their reference behavior."""
    from projet_big_data_boutin_danre_spark.operators.cleaning import (
        coerce_numeric,
    )

    cases = [
        ("1\x1f", 0.0),   # the found counterexample
        ("\x081", 0.0),   # leading non-ws control char
        ("1\x00", 0.0),
        ("1\x1e2", 0.0),  # interior control char fails either way
        (" 1 ", 1.0),     # real whitespace trims
        ("\t1\n", 1.0),
        ("\x0b1\x0c", 1.0),
        ("1\xa0", 0.0),   # unicode NBSP: rejected by both engines
        ("nan", 0.0),     # the documented nanvl hop
        ("2.5", 2.5),
        ("", 0.0),
        (None, 0.0),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(cases)], "i int, v string"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", coerce_numeric("v").alias("out")).collect()
    }
    for i, (v, want) in enumerate(cases):
        assert got[i] == want, (v, got[i], want)
