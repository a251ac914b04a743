"""Golden end-to-end test of the reference usage-layer pipeline
(SURVEY.md §3.2) on a DVF/LBC-shaped fixture (FIXTURES.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import documents, usage


@pytest.fixture(scope="module")
def dvf(spark):
    rows = [
        # code_commune, valeur, surface, type_local, lat, lon
        Row(id_mutation="m1", code_commune="75101", valeur_fonciere=500000.0,
            surface_reelle_bati=50.0, type_local="Appartement",
            latitude=48.86, longitude=2.34),
        Row(id_mutation="m2", code_commune="75101", valeur_fonciere=900000.0,
            surface_reelle_bati=100.0, type_local="Appartement",
            latitude=48.86, longitude=2.35),
        Row(id_mutation="m3", code_commune="75102", valeur_fonciere=300000.0,
            surface_reelle_bati=30.0, type_local="Maison",
            latitude=48.87, longitude=2.34),
        # filtered out: below min value (strict >1000 keeps 1001)
        Row(id_mutation="m4", code_commune="75101", valeur_fonciere=1000.0,
            surface_reelle_bati=50.0, type_local="Appartement",
            latitude=48.86, longitude=2.34),
        # filtered out: surface at the strict bound (>9 drops 9)
        Row(id_mutation="m5", code_commune="75101", valeur_fonciere=200000.0,
            surface_reelle_bati=9.0, type_local="Appartement",
            latitude=48.86, longitude=2.34),
        # filtered out: null value
        Row(id_mutation="m6", code_commune="75103", valeur_fonciere=None,
            surface_reelle_bati=40.0, type_local="Maison",
            latitude=48.85, longitude=2.36),
        # filtered out: not Paris prefix
        Row(id_mutation="m7", code_commune="69001", valeur_fonciere=400000.0,
            surface_reelle_bati=40.0, type_local="Maison",
            latitude=45.76, longitude=4.83),
    ]
    return spark.createDataFrame(rows)


def test_market_stats_golden(spark, dvf):
    stats = {
        r["code_commune"]: (r["avg_price_m2_commune"], r["nb_ventes"])
        for r in usage.market_stats(dvf).collect()
    }
    # 75101: (500000/50 + 900000/100)/2 = (10000+9000)/2 = 9500
    assert stats["75101"] == (9500.0, 2)
    # 75102: 300000/30 = 10000
    assert stats["75102"] == (10000.0, 1)
    assert set(stats) == {"75101", "75102"}


def test_opportunities_join_preserves_reference_semantics(spark, dvf):
    stats = usage.market_stats(dvf)
    ads = spark.createDataFrame(
        [
            Row(id=1, title="appart", location=Row(city="Paris", zipcode="75101",
                lat=48.86, lng=2.34)),
            Row(id=2, title="zip-mismatch", location=Row(city="Paris",
                zipcode="75001", lat=48.86, lng=2.34)),
        ]
    )
    out = {r["id"]: r for r in usage.opportunities(ads, stats).collect()}
    # the reference joins LBC zipcode to DVF INSEE code verbatim —
    # 75101 hits, the real-world 75001 zipcode misses (by design)
    assert out[1]["avg_price_m2_commune"] == 9500.0
    assert out[2]["avg_price_m2_commune"] is None


def test_quality_filter_inclusive_bounds(spark):
    rows = [
        Row(t="Appartement", v=5000.0, s=9.0, latitude=1.0, longitude=1.0),   # keep (inclusive)
        Row(t="Appartement", v=4999.0, s=50.0, latitude=1.0, longitude=1.0),  # drop value
        Row(t="Maison", v=50_000_000.0, s=10_000.0, latitude=1.0, longitude=1.0),  # keep
        Row(t="Maison", v=50_000_001.0, s=50.0, latitude=1.0, longitude=1.0),  # drop value
        Row(t="Dépendance", v=100000.0, s=50.0, latitude=1.0, longitude=1.0),  # drop type
        Row(t="Appartement", v=100000.0, s=50.0, latitude=None, longitude=1.0),  # drop geo
    ]
    df = spark.createDataFrame(rows)
    out = documents.quality_filter(
        df, type_col="t", value_col="v", surface_col="s"
    ).collect()
    assert {(r["v"], r["s"]) for r in out} == {(5000.0, 9.0), (50_000_000.0, 10_000.0)}


def test_sparse_document_omits_nulls(spark):
    df = spark.createDataFrame(
        [(1, "x", None, 3.0)], "id int, a string, b string, c double"
    )
    out = documents.sparse_document(df, "id", ["a", "b", "c"]).collect()[0]
    assert out["_id"] == "1"
    assert out["doc_json"] == '{"a":"x","c":3.0}'


def test_fan_out_prefix(spark):
    df = spark.createDataFrame(
        [Row(code="75101"), Row(code="69001"), Row(code="75020")]
    )
    all_docs, paris = documents.fan_out_prefix(df, "code")
    assert all_docs.count() == 3
    assert {r["code"] for r in paris.collect()} == {"75101", "75020"}


def test_full_pipeline_raw_to_documents(spark, dvf):
    """The whole reference DAG (SURVEY §3.1) as one chain: raw LBC
    JSON → format (keep-last dedup) → usage (market stats + join) →
    document projection — goldens at every layer boundary."""
    from projet_big_data_boutin_danre_spark.operators import cleaning

    raw = spark.createDataFrame(
        [
            # stale scrape of ad 1 (file 1) — keep-last must drop it
            ('{"list_id": 1, "subject": "old title", "price_cents": [100000], '
             '"date": "2025-01-01 09:00:00", '
             '"location": {"city":"Paris","zipcode":"75101","lat":48.86,"lng":2.34}, '
             '"attributes": []}', 1),
            # fresh scrape of ad 1 (file 2)
            ('{"list_id": 1, "subject": "appart centre", "price_cents": [50000000], '
             '"date": "2025-01-01 10:00:00", '
             '"location": {"city":"Paris","zipcode":"75101","lat":48.86,"lng":2.34}, '
             '"attributes": []}', 2),
            ('{"list_id": 2, "subject": "maison", "price_cents": [30000000], '
             '"date": "2025-01-01 10:00:00", "location": "N/A", '
             '"attributes": []}', 2),
        ],
        "raw_json string, ingest_order int",
    )
    formatted = cleaning.keep_last_dedup(
        cleaning.format_ads(raw, extra_cols=["ingest_order"]),
        ["id"],
        "ingest_order",
    )
    rows = {r["id"]: r for r in formatted.collect()}
    assert rows[1]["title"] == "appart centre"  # keep-last won
    assert rows[1]["price"] == 500000.0
    assert rows[2]["zipcode"] is None  # "N/A" location → null struct

    stats = usage.market_stats(dvf)
    ads = formatted.select(
        "id", "title", F.struct(
            F.col("city"), F.col("zipcode"),
            F.lit(48.86).alias("lat"), F.lit(2.34).alias("lng"),
        ).alias("location"),
    )
    enriched = usage.opportunities(ads, stats)
    out = {r["id"]: r for r in enriched.collect()}
    assert out[1]["avg_price_m2_commune"] == 9500.0  # 75101 golden
    assert out[2]["avg_price_m2_commune"] is None  # null zip joins nothing

    docs = documents.sparse_document(
        enriched.withColumn("avg_m2", F.col("avg_price_m2_commune")),
        "id",
        ["title", "avg_m2"],
    )
    doc = {r["_id"]: r["doc_json"] for r in docs.collect()}
    assert doc["1"] == '{"title":"appart centre","avg_m2":9500.0}'
    assert doc["2"] == '{"title":"maison"}'  # null field omitted


def test_index_counters_null_predicate_counts_as_filtered(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, 200.0), (3, None)], "id int, v double"
    )
    out = documents.index_counters(df, F.col("v") < 100.0).collect()[0]
    # id=3: predicate is NULL, not false — must land in filtered like
    # the reference row-loop's if/else.
    assert (
        out["total_processed"],
        out["count_indexed"],
        out["count_filtered"],
    ) == (3, 1, 2)


def test_facet_totals_max_pages(spark):
    df = spark.createDataFrame([Row(owner="pro")] * 36 + [Row(owner="private")])
    out = {r["owner"]: (r["total"], r["max_pages"])
           for r in usage.facet_totals(df, "owner", page_limit=35).collect()}
    assert out["pro"] == (36, 2)
    assert out["private"] == (1, 1)
