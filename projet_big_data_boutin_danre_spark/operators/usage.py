"""Usage-layer analytics (SURVEY.md §2.2 P1-P3, §2.3 J1/J2, §2.4 A1).

The reference's single Spark job (``dags/lib/compute_usage.py:42-77``):
filter Paris/valid rows → derive €/m² → groupBy commune avg+count →
left-join the stats back onto the listings. Re-expressed as composable
DataFrame transforms, parameterized so the same operators drive both
the DVF-shaped pipeline and the TPC-H-shaped oracle queries.

Scale notes (100 TB):
- ``group_stats`` is a hash aggregation — partial (map-side) + final
  after one exchange on the group key; the filter and the projection
  to the 3 needed columns are pushed into the parquet scan by Catalyst.
- ``enrich_left_join`` broadcasts the stats side: a per-key aggregate
  is orders of magnitude smaller than the fact table (≤ ~35k communes
  in the reference; ≤ distinct-key count in general), so the join is
  shuffle-free on the fact side. The reference recomputes the stats
  plan for its join (``compute_usage.py:67-75``, no cache); we take the
  already-computed DataFrame and let Spark reuse/broadcast it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_valid_sales(
    df: DataFrame,
    commune_prefix: str = "75",
    min_value: float = 1000.0,
    min_surface: float = 9.0,
) -> DataFrame:
    """P1: conjunctive quality filter (``compute_usage.py:42-47``) —
    prefix match + not-null + strict `>` bounds, verbatim semantics."""
    return df.filter(
        F.col("code_commune").startswith(commune_prefix)
        & F.col("valeur_fonciere").isNotNull()
        & (F.col("surface_reelle_bati") > F.lit(min_surface))
        & (F.col("valeur_fonciere") > F.lit(min_value))
    )


def derive_price_per_m2(df: DataFrame) -> DataFrame:
    """P2: ``prix_m2 = valeur_fonciere / surface_reelle_bati``
    (``compute_usage.py:49-52``)."""
    return df.withColumn(
        "prix_m2", F.col("valeur_fonciere") / F.col("surface_reelle_bati")
    )


def group_stats(
    df: DataFrame,
    key: str,
    value_col: str,
    avg_alias: str = "avg_price_m2_commune",
    count_alias: str = "nb_ventes",
    round_to: int | None = None,
) -> DataFrame:
    """A1: ``groupBy(key).agg(avg(value), count(*))``
    (``compute_usage.py:54-57``). ``round_to`` stabilizes float output
    for cross-engine comparison via the floor idiom — cents/quantity
    ratios averaged over an evenly-dividing count land exactly on
    decimal half-boundaries, where engines' round() disagree
    (SCALE.md)."""
    avg_expr: Column = F.avg(value_col)
    if round_to is not None:
        scale = F.lit(float(10**round_to))
        avg_expr = F.floor(avg_expr * scale + F.lit(0.5)) / scale
    return df.groupBy(key).agg(
        avg_expr.alias(avg_alias),
        F.count(F.lit(1)).alias(count_alias),
    )


def market_stats(df_dvf: DataFrame, round_to: int | None = None) -> DataFrame:
    """The reference's market-stats table end-to-end (P1→P2→A1)."""
    return group_stats(
        derive_price_per_m2(filter_valid_sales(df_dvf)),
        key="code_commune",
        value_col="prix_m2",
        round_to=round_to,
    )


def enrich_left_join(
    facts: DataFrame,
    stats: DataFrame,
    fact_key: Column | str,
    stats_key: Column | str,
    broadcast_stats: bool = True,
) -> DataFrame:
    """J1: left equi-join enrichment (``compute_usage.py:73-77``).

    The stats side is broadcast by default — it is a per-key aggregate
    and therefore small relative to the fact table at any scale where
    the key cardinality fits an executor (tens of millions of keys ≈
    a few GB; beyond that pass ``broadcast_stats=False`` and AQE picks
    the strategy).
    """
    fk = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    sk = F.col(stats_key) if isinstance(stats_key, str) else stats_key
    right = F.broadcast(stats) if broadcast_stats else stats
    return facts.join(right, fk == sk, "left")


def opportunities(df_lbc: DataFrame, stats: DataFrame) -> DataFrame:
    """Reference usage-layer join: extract ``zip`` from the nested
    location struct (P3) and left-join commune stats (J1) — preserving
    the reference's zip⋈code_commune equality semantics verbatim
    (SURVEY.md §2.3: mostly-null for Paris by design)."""
    with_zip = df_lbc.withColumn("zip", F.col("location.zipcode"))
    return enrich_left_join(with_zip, stats, "zip", "code_commune")


def two_step_lookup(
    base: DataFrame,
    dim1: DataFrame,
    key1: str,
    dim2: DataFrame,
    key2: str,
) -> DataFrame:
    """J2: the user→pro-store conditional 2-call enrichment
    (``dags/lbc/lbc/mixin/user.py:18-26``) as two left joins — the
    "fetch only if pro" branch becomes null-propagation. Both dims are
    broadcast (lookup tables)."""
    return base.join(F.broadcast(dim1), key1, "left").join(
        F.broadcast(dim2), key2, "left"
    )


def point_lookup(df: DataFrame, key: str, value) -> DataFrame:
    """S6: ``get_ad(id)`` → predicate-pushdown point lookup."""
    return df.filter(F.col(key) == F.lit(value))


def facet_totals(
    df: DataFrame,
    owner_col: str,
    page_limit: int = 35,
) -> DataFrame:
    """A5: the search-envelope facet totals
    (``dags/lbc/lbc/model/search.py:6-35``) — grouped counts plus
    ``max_pages = ceil(total/limit)`` per facet value."""
    return (
        df.groupBy(owner_col)
        .agg(F.count(F.lit(1)).alias("total"))
        .withColumn(
            "max_pages",
            F.ceil(F.col("total") / F.lit(page_limit)).cast("long"),
        )
    )
