"""Pinned schemas.

The reference infers every schema (pandas ``low_memory=False`` CSV
inference at ``dags/lib/raw_to_fmt_dvf.py:26``, ``list[dict]`` frames
at ``dags/lib/raw_to_fmt_lbc.py:47``, Parquet-footer inference at
``dags/lib/compute_usage.py:34,67``). Inference loses INSEE leading
zeros and types drifting per batch — so this engine pins every schema
and treats inference as an explicit opt-in (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# DVF — géo-DVF property transactions (columns the reference touches;
# dags/lib/compute_usage.py:37, dags/lib/index_to_es.py:221-269,
# ML_ROADMAP.md:21-27). INSEE/postal codes are STRINGS (leading zeros).
# ---------------------------------------------------------------------------
DVF_SCHEMA = StructType(
    [
        StructField("id_mutation", StringType()),
        StructField("date_mutation", TimestampType()),
        StructField("nature_mutation", StringType()),
        StructField("valeur_fonciere", DoubleType()),
        StructField("code_commune", StringType()),
        StructField("nom_commune", StringType()),
        StructField("code_postal", StringType()),
        StructField("type_local", StringType()),
        StructField("surface_reelle_bati", DoubleType()),
        StructField("nombre_pieces_principales", IntegerType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Leboncoin ad record as persisted to raw JSON
# (dags/lib/lbc_fetcher.py:100-125). ``location`` degrades to the
# *string* "N/A" at the source; the pinned schema declares the struct
# and the reader normalizes (operators/cleaning.py).
# ---------------------------------------------------------------------------
LBC_LOCATION_SCHEMA = StructType(
    [
        StructField("city", StringType()),
        StructField("zipcode", StringType()),
        StructField("lat", DoubleType()),
        StructField("lng", DoubleType()),
    ]
)

LBC_AD_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("title", StringType()),
        StructField("price", DoubleType()),
        StructField("url", StringType()),
        StructField("date", TimestampType()),
        StructField("location", LBC_LOCATION_SCHEMA),
        StructField("attributes", MapType(StringType(), StringType())),
        StructField("category_id", StringType()),
        StructField("owner_type", StringType()),
        StructField("shippable", BooleanType()),
    ]
)

# Raw (pre-coercion) variant: price/date arrive as strings and location
# may be the literal string "N/A" — modeled as a raw JSON string column
# to be parsed+normalized by the cleaning operators.
LBC_AD_RAW_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("ingest_seq", LongType()),  # file-concatenation order
        StructField("title", StringType()),
        StructField("price", StringType()),
        StructField("url", StringType()),
        StructField("date", StringType()),
        StructField("location_json", StringType()),
        StructField("attributes", MapType(StringType(), StringType())),
        StructField("category_id", StringType()),
        StructField("owner_type", StringType()),
        StructField("shippable", BooleanType()),
    ]
)

# ---------------------------------------------------------------------------
# Usage-layer outputs (dags/lib/compute_usage.py:54-77)
# ---------------------------------------------------------------------------
MARKET_STATS_SCHEMA = StructType(
    [
        StructField("code_commune", StringType()),
        StructField("avg_price_m2_commune", DoubleType()),
        StructField("nb_ventes", LongType()),
    ]
)

# ---------------------------------------------------------------------------
# State checkpoint (dags/lib/lbc_fetcher.py:43-46,134-137)
# ---------------------------------------------------------------------------
WATERMARK_STATE_SCHEMA = StructType(
    [StructField("last_fetched", TimestampType())]
)

# ---------------------------------------------------------------------------
# Multimodal: opaque binary payload + typed metadata (engine extension;
# the image/audio codecs are stubbed — Spark-side plumbing is real).
# ---------------------------------------------------------------------------
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata (TESTDATA.md) — pinned for readStream and validation.
# ---------------------------------------------------------------------------
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)
