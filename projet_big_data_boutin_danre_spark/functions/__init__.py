from .geo import haversine_km, within_radius_km
from .hashing import (
    hex_digit_value,
    md5_min_shingle,
    normalize_text,
    stable_fingerprint,
)
from .numeric import exact_avg, exact_sum

__all__ = [
    "haversine_km",
    "within_radius_km",
    "hex_digit_value",
    "md5_min_shingle",
    "normalize_text",
    "stable_fingerprint",
    "exact_avg",
    "exact_sum",
]
