"""Trivial-pair contraction probe for connected_components (r10,
judge item #3).

The sweep's scaled corpus cannot exercise the peel: k shifted EXACT
copies of every document merge each 1× cluster into one k-times-larger
cluster, and the sf0.1 synthetic word bags already form ONE giant
4,832-node near-dup hairball (72,846 edges, 9 isolated pairs — 0.01%
trivial share, measured r10). Real near-dup graphs are the opposite:
most clusters are size 2 (the judge's premise, and RefinedWeb/SemDeDup
observations). This probe measures the contraction in BOTH regimes at
the 32×-sweep pair volume (~2.3M edges) on synthetic edge frames:

- ``pairheavy``: 85% isolated edges + 15% length-8 chains — the
  realistic shape. The peel removes the isolated 85% before the
  large-star/small-star loop, so every iterated round shuffles ~7×
  fewer edges.
- ``hairball``: one giant random component (each node i>0 linked to
  two random smaller nodes) — the sweep's shape. The peel finds
  nothing; its cost is the bounded overhead (one degree aggregation +
  a node-sized self-join + one anti-join, paid once).

Protocol: interleaved A/B (ORDER mirrors tools/ab_probe.py) with
min-of-4, rounds reported from stats["rounds"] so convergence-count
regressions are visible alongside wall time.

Usage: python tools/peel_probe.py [n_edges]
Output: one markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from projet_big_data_boutin_danre_spark.operators import dedup
from projet_big_data_boutin_danre_spark.session import get_spark

ORDER = "ABBABAAB"


def pairheavy_edges(spark, n_edges: int) -> DataFrame:
    """85% isolated (2i, 2i+1) pairs; 15% chains of length 8 in a
    disjoint id range (edges (b+j, b+j+1), j % 8 != 7)."""
    n_iso = int(n_edges * 0.85)
    n_chain = n_edges - n_iso
    iso = spark.range(n_iso).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )
    base = 2 * n_iso + 10
    chain = (
        spark.range(int(n_chain * 8 / 7) + 8)
        .filter(F.col("id") % 8 != 7)
        .limit(n_chain)
        .select(
            (F.col("id") + base).alias("id_a"),
            (F.col("id") + base + 1).alias("id_b"),
        )
    )
    return iso.unionByName(chain)


def hairball_edges(spark, n_edges: int) -> DataFrame:
    """One connected blob: node i in [1, n/2) gets edges to two
    deterministic pseudo-random smaller nodes (xxhash64-derived, so
    no Math.random — reproducible)."""
    n_nodes = n_edges // 2
    nodes = spark.range(1, n_nodes)
    return nodes.select(
        F.col("id").alias("id_a"),
        F.pmod(F.xxhash64("id"), F.col("id")).alias("id_b"),
    ).unionByName(
        nodes.select(
            F.col("id").alias("id_a"),
            F.pmod(F.xxhash64(F.col("id") + 7), F.col("id")).alias("id_b"),
        )
    )


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_300_000
    spark = get_spark("peel_probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for regime, gen in (
        ("pairheavy", pairheavy_edges),
        ("hairball", hairball_edges),
    ):
        edges = gen(spark, n_edges).persist()
        edges.count()
        times: dict[bool, list[float]] = {True: [], False: []}
        rounds: dict[bool, int] = {}
        counts: dict[bool, int] = {}
        # joint warmup (uncounted) so neither arm absorbs codegen cost
        dedup.connected_components(
            edges.limit(50_000), a_col="id_a", b_col="id_b"
        ).count()
        for ch in ORDER:
            cp = ch == "A"
            st: dict = {}
            t0 = time.time()
            cnt = dedup.connected_components(
                edges, a_col="id_a", b_col="id_b",
                contract_pairs=cp, stats=st,
            ).count()
            times[cp].append(time.time() - t0)
            rounds[cp] = st.get("rounds", -1)
            counts[cp] = cnt
        assert counts[True] == counts[False], counts
        out[regime] = {
            "contract_min_s": round(min(times[True]), 2),
            "baseline_min_s": round(min(times[False]), 2),
            "contract_rounds": rounds[True],
            "baseline_rounds": rounds[False],
            "rows": counts[True],
        }
        edges.unpersist()

    print(f"\n## trivial-pair contraction A/B ({n_edges:,} edges, min-of-4)\n")
    print("| regime | contract=True | contract=False | rounds T/F | rows |")
    print("|---|---|---|---|---|")
    for regime, r in out.items():
        print(
            f"| {regime} | {r['contract_min_s']}s | {r['baseline_min_s']}s "
            f"| {r['contract_rounds']}/{r['baseline_rounds']} | {r['rows']:,} |"
        )
    print()
    print(json.dumps({"metric": "peel_probe", "n_edges": n_edges, "results": out}))


if __name__ == "__main__":
    main()
