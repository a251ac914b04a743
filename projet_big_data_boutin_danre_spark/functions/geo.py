"""Geo column expressions (SURVEY.md §2.8 Q5/Q7).

The reference ships lat/lng+radius filters to the remote search API
(``dags/lbc/lbc/utils.py:88-96,232-243``). Locally that becomes a
haversine distance predicate — pure Column trigonometry, JVM-side,
whole-stage-codegen friendly. No UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lng1: Column, lat2: Column, lng2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lng) pairs in
    degrees. asin-form haversine: numerically fine for the radii the
    query surface uses (city/place search, ≤ a few hundred km)."""
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlng / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def within_radius_km(
    lat: Column, lng: Column, center_lat: float, center_lng: float, radius_km: float
) -> Column:
    """Q5/Q7 predicate: point within ``radius_km`` of a fixed center.

    Scale note: wrap with a cheap bounding-box pre-filter so the
    parquet scan can min/max-skip row groups before the trig runs.
    """
    # ~1 deg lat = 111.32 km; lng shrinks by cos(lat). Box is slightly
    # generous (uses cos at center), trig predicate is exact.
    import math

    dlat = radius_km / 111.32
    dlng = radius_km / (111.32 * max(math.cos(math.radians(center_lat)), 1e-6))
    box = (
        lat.between(center_lat - dlat, center_lat + dlat)
        & lng.between(center_lng - dlng, center_lng + dlng)
    )
    exact = (
        haversine_km(lat, lng, F.lit(float(center_lat)), F.lit(float(center_lng)))
        <= F.lit(float(radius_km))
    )
    return box & exact
