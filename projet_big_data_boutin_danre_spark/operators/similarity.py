"""Similarity search over embedding columns (engine extension).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the 100 TB scale path. Dot products are
computed with ``zip_with`` + ``aggregate`` — JVM higher-order
functions, sequential fold in array order (deterministic, oracle-
matchable) — not a Python UDF.

Scale design:
- ``cosine_topk`` joins queries × corpus. For a bounded query set it
  broadcasts the queries, so the corpus is scanned once with no
  shuffle; per-partition top-k then a tiny final merge
  (window over ≤ |queries|·k rows).
- ``rh_lsh_buckets``/``ann_topk_lsh`` prune the corpus to matching
  hyperplane-sign buckets before scoring — the candidate join is an
  equi-join on the bucket key.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as an ordered left fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank) with rank 1..k by
    (cosine desc, neighbor_id asc) — a total order, so results are
    deterministic under any partitioning. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def near_dup_pairs_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.9,
    round_to: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs within a blocking key: id_a <
    id_b and cosine ≥ threshold. The block bounds the pair fan-out
    (label, LSH bucket, shard…); the join is an equi-join on it."""
    base = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        _as_double_array(vec_col).alias("v"),
    )
    a = base.select("block", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = base.select("block", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_to).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def rh_lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string of ``n_planes``
    fixed pseudo-random hyperplanes. Planes are generated
    deterministically driver-side (seeded LCG) and inlined as array
    literals — broadcast-free constants in the plan."""
    planes = _lcg_planes(n_planes, dim, seed)
    v = _as_double_array(vec_col)
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return df.select(
        F.col(id_col).alias("id"), F.concat(*bits).alias("bucket")
    )


def _lcg_planes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian-ish plane components in [-1, 1]
    via a linear congruential generator (reproducible in pure SQL if
    ever needed; no RNG dependency)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append((state / float(2**31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def ann_topk_lsh(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane bucket. Recall trades with ``n_planes``; at scale use
    multiple tables (union of several plane sets) for recall."""
    cb = rh_lsh_buckets(df, id_col, vec_col, n_planes, dim).join(
        df.select(F.col(id_col).alias("id"), _as_double_array(vec_col).alias("cv")),
        "id",
    )
    qb = rh_lsh_buckets(queries, id_col, vec_col, n_planes, dim).join(
        queries.select(F.col(id_col).alias("id"), _as_double_array(vec_col).alias("qv")),
        "id",
    ).withColumnsRenamed({"id": "query_id"})
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
