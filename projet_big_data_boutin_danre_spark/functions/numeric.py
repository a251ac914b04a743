"""Order-independent (deterministic) floating aggregates.

Summing doubles is not associative: the result depends on partition
count and merge order, so ``round(sum(x), 2)`` can flip its last digit
between runs — and between Spark and an oracle engine — whenever the
true value sits near a rounding boundary. The reference never hits
this because it runs single-threaded pandas; a distributed engine
must sum in exact arithmetic instead.

Technique: cast each input to a fixed-scale decimal (per-row cast of
a double is deterministic IEEE → decimal rounding, identical on any
engine), sum exactly in decimal (associative, order-independent),
then convert the single exact total back to double for division /
final rounding. Pure built-in Column algebra — stays inside
whole-stage codegen, and the partial/final hash-aggregate plan is
unchanged (decimal sums have map-side partial aggregation just like
double sums).

DuckDB-oracle equivalents::

    exact_sum : round(CAST(sum(CAST(x AS DECIMAL(30,s))) AS DOUBLE), r)
    exact_avg : round(CAST(sum(CAST(x AS DECIMAL(30,s))) AS DOUBLE)
                      / count(x), r)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default precision: 30 digits holds 10^24 at scale 6 — far beyond
#: any 100 TB-scale sum of prices; Spark widens sum(decimal(30,s)) to
#: decimal(38,s) so overflow headroom is ~10^8 partitions of maxed
#: partials.
PRECISION = 30


def exact_sum(col: Column, scale: int = 2, round_to: int | None = 2) -> Column:
    """Order-independent sum of a double column, as double.

    ``scale`` must cover the true decimal scale of the data (2 for
    prices, 6 for products of 2-dp factors).
    """
    total = F.sum(col.cast(f"decimal({PRECISION},{scale})")).cast("double")
    return total if round_to is None else F.round(total, round_to)


def exact_avg(col: Column, scale: int = 6, round_to: int | None = 2) -> Column:
    """Order-independent average of a double column, as double.

    Exact decimal sum divided by the non-null count in double — the
    one double division is per-group deterministic.
    """
    avg = exact_sum(col, scale=scale, round_to=None) / F.count(col)
    return avg if round_to is None else F.round(avg, round_to)
