"""Document projection + quality filtering (SURVEY.md §2.2 P4/P5/P8/P9,
§2.1 K3/K4 modeled as DataFrame outputs).

The reference row-iterates DataFrames into Elasticsearch action dicts
(``dags/lib/index_to_es.py:81-341``). Here the *document shape* is a
DataFrame transform (checkable by the oracle) and the wire sink is a
separate adapter (sinks.py) — correctness is tested before I/O.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_filter(
    df: DataFrame,
    type_col: str = "type_local",
    allowed_types: Sequence[str] = ("Appartement", "Maison"),
    value_col: str = "valeur_fonciere",
    value_range: tuple[float, float] = (5000.0, 50_000_000.0),
    surface_col: str = "surface_reelle_bati",
    surface_range: tuple[float, float] = (9.0, 10_000.0),
    geo_cols: Sequence[str] = ("latitude", "longitude"),
) -> DataFrame:
    """P4: the indexer's row-loop quality gate
    (``index_to_es.py:227-244``) as one filter chain. Bounds are
    inclusive-reject (``< lo or > hi`` drops), i.e. BETWEEN keeps —
    verbatim reference semantics."""
    cond = F.col(type_col).isin(*allowed_types)
    cond &= F.col(value_col).between(*value_range)
    cond &= F.col(surface_col).between(*surface_range)
    for g in geo_cols:
        cond &= F.col(g).isNotNull()
    return df.filter(cond)


def geo_pin(lat_col: str = "latitude", lng_col: str = "longitude") -> Column:
    """P9: the ES geo_point document field
    ``pin = {location: {lat, lon}}`` (``index_to_es.py:248-253``)."""
    return F.struct(
        F.struct(
            F.col(lat_col).cast("double").alias("lat"),
            F.col(lng_col).cast("double").alias("lon"),
        ).alias("location")
    )


def sparse_document(df: DataFrame, id_col: str, fields: Sequence[str]) -> DataFrame:
    """P8: the null-omitting document projection (``clean_doc``,
    ``index_to_es.py:63-79``) — each row becomes (_id, doc_json) where
    null fields are OMITTED from the JSON (sparse-document semantics),
    timestamps serialized ISO-8601."""
    return df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.to_json(
            F.struct(*[F.col(f) for f in fields]),
            {"ignoreNullFields": "true", "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss"},
        ).alias("doc_json"),
    )


def index_counters(
    df: DataFrame,
    kept: Column,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """A4: the indexers' per-run tallies — ``total_processed`` /
    ``count_indexed`` (count_ok) / ``count_filtered``
    (``index_to_es.py:114-144,218-282``) — as ONE conditional
    aggregation pass instead of the reference's row-loop counters.
    ``when(kept, 1).otherwise(0)`` (not a boolean cast) so a
    null-valued predicate counts as filtered, exactly like the
    row-loop's if/else and SQL's CASE WHEN."""
    aggs = [
        F.count(F.lit(1)).alias("total_processed"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("count_indexed"),
        F.sum(F.when(kept, 0).otherwise(1)).alias("count_filtered"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def fan_out_prefix(
    df: DataFrame, code_col: str, prefix: str = "75"
) -> tuple[DataFrame, DataFrame]:
    """P5: one input → (all, prefix-subset) — the gov-dvf /
    gov-dvf-paris fan-out (``index_to_es.py:262-269``). One scan, two
    outputs; Spark reuses the scan via the shared plan when both are
    written in the same job (or ``.persist()`` across jobs)."""
    all_docs = df
    paris = df.filter(F.col(code_col).cast("string").startswith(prefix))
    return all_docs, paris
