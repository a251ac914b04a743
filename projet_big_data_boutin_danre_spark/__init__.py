"""PySpark-native analytics engine re-expressing the capabilities of
``Arthur-Boutin/Projet_big_data_boutin_danre`` (reference at
/root/reference, read-only) as idiomatic Spark DataFrame/SQL operators.

Layout
------
- ``session``    : SparkSession factory with scale-aware defaults.
- ``schemas``    : pinned StructTypes (the reference infers everything;
                   we don't — SURVEY.md §1.2).
- ``sources``    : pinned-schema readers + sinks (parquet/json/csv, the
                   lake layers, the state checkpoint).
- ``operators``  : the §2 operator inventory — cleaning, usage-layer
                   analytics, joins, dedup, similarity, text analysis,
                   pagination, document projection.
- ``functions``  : column-expression helpers (haversine, hashing,
                   coercing casts) — no Python UDFs on the parity path.
- ``plans``      : the SearchSpec → Column compiler (the reference's
                   query-builder surface, dags/lbc/lbc/utils.py).
- ``streaming``  : watermark/incremental + Structured Streaming variants.
"""

__version__ = "0.1.0"
