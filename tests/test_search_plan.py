"""Tests for the SearchSpec → Column compiler (SURVEY.md §2.8) and the
URL parser (Q11), including the haversine edge cases (§5.4)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.functions.geo import (
    haversine_km,
    within_radius_km,
)
from projet_big_data_boutin_danre_spark.plans import (
    SearchSpec,
    compile_search,
    parse_search_url,
)


def ads(spark):
    rows = [
        Row(id=1, title="maison avec jardin", price=300000.0, category_id="9",
            owner_type="private", shippable=False, lat=48.86, lng=2.34,
            square=120.0),
        Row(id=2, title="appartement centre", price=150000.0, category_id="9",
            owner_type="pro", shippable=False, lat=48.85, lng=2.35,
            square=45.0),
        Row(id=3, title="maison bord de mer", price=500000.0, category_id="9",
            owner_type="private", shippable=False, lat=43.29, lng=5.37,
            square=150.0),  # Marseille — outside Paris radius
        Row(id=4, title="velo de course", price=800.0, category_id="2",
            owner_type="private", shippable=True, lat=48.86, lng=2.34,
            square=None),
    ]
    return spark.createDataFrame(rows)


def test_text_category_range_owner(spark):
    spec = SearchSpec(
        text="maison",
        category="9",
        ranges={"price": (200000.0, 600000.0)},
        owner_type="private",
        sort_by="price",
        sort_asc=True,
        limit=10,
    )
    out = compile_search(ads(spark), spec).collect()
    assert [r["id"] for r in out] == [1, 3]


def test_geo_radius_straddle(spark):
    # Paris center, 10 km: ids 1,2,4 in; Marseille out (FIXTURES.md §4.6)
    spec = SearchSpec(geo_radius=(48.8599, 2.3380, 10.0))
    out = compile_search(ads(spark), spec).collect()
    assert [r["id"] for r in out] == [1, 2, 4]


def test_pagination_total_order(spark):
    spec = SearchSpec(limit=2, page=2, sort_by="price", sort_asc=True)
    out = compile_search(ads(spark), spec).collect()
    # prices asc: 800(4), 150000(2), 300000(1), 500000(3) → page2 = [1, 3]
    assert [r["id"] for r in out] == [1, 3]


def test_open_ended_ranges_and_enums(spark):
    spec = SearchSpec(ranges={"square": (100.0, None)})
    assert {r["id"] for r in compile_search(ads(spark), spec).collect()} == {1, 3}
    spec = SearchSpec(enums={"owner_type": ["pro"]})
    assert {r["id"] for r in compile_search(ads(spark), spec).collect()} == {2}


def test_shippable_flag(spark):
    spec = SearchSpec(shippable=True)
    assert [r["id"] for r in compile_search(ads(spark), spec).collect()] == [4]


def test_parse_search_url_roundtrip():
    url = (
        "https://www.example.fr/recherche?text=maison&category=9"
        "&price=200000-600000&square=100-&owner_type=private"
        "&real_estate_type=1,2&sort_by=price&sort_order=asc&page=2&limit=20"
        "&shippable=false"
    )
    spec = parse_search_url(url)
    assert spec.text == "maison"
    assert spec.category == "9"
    assert spec.ranges["price"] == (200000.0, 600000.0)
    assert spec.ranges["square"] == (100.0, None)
    assert spec.owner_type == "private"
    assert spec.enums["real_estate_type"] == ["1", "2"]
    assert spec.sort_by == "price" and spec.sort_asc
    assert spec.page == 2 and spec.limit == 20
    assert spec.shippable is False


def test_haversine_known_distance(spark):
    # Paris → Marseille ≈ 660 km great-circle
    df = spark.range(1).select(
        haversine_km(F.lit(48.8566), F.lit(2.3522), F.lit(43.2965), F.lit(5.3698)).alias("d")
    )
    d = df.collect()[0]["d"]
    assert 655 < d < 665
    # zero distance
    z = spark.range(1).select(
        haversine_km(F.lit(48.0), F.lit(2.0), F.lit(48.0), F.lit(2.0)).alias("d")
    ).collect()[0]["d"]
    assert z == 0.0


def test_within_radius_bounding_box_consistency(spark):
    # points just inside/outside a 10 km radius
    df = spark.createDataFrame(
        [Row(id=1, lat=48.90, lng=2.34), Row(id=2, lat=49.10, lng=2.34)]
    )
    out = df.filter(
        within_radius_km(F.col("lat"), F.col("lng"), 48.8599, 2.3380, 10.0)
    ).collect()
    assert [r["id"] for r in out] == [1]


def test_all_tokens_match_semantics(spark):
    """Q1 stretch (SURVEY §2.8): all_tokens requires every query
    token as a WHOLE haystack token, any order, case/punct
    insensitive — and never substring-matches inside a longer word."""
    from pyspark.sql import Row

    rows = [
        Row(id=1, title="grande maison de campagne"),
        Row(id=2, title="Campagne! autour d'une MAISON"),   # both, scrambled
        Row(id=3, title="maisonnette en campagne"),          # substring only
        Row(id=4, title="maison en ville"),                  # one token
        Row(id=5, title=None),
    ]
    df = spark.createDataFrame(rows)
    spec = SearchSpec(
        text="Maison, campagne!",
        text_match="all_tokens",
        sort_by=None,
        limit=10,
    )
    got = sorted(r["id"] for r in compile_search(df, spec).collect())
    assert got == [1, 2]
    # substring mode keeps its reference semantics (exact contains)
    sub = SearchSpec(text="maison", limit=10)
    assert sorted(
        r["id"] for r in compile_search(df, sub).collect()
    ) == [1, 3, 4]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="text_match"):
        compile_search(df, SearchSpec(text="x", text_match="fuzzy"))
