"""IVF ANN + LSH-blocked near-dup tests: the data-adaptive and
hash-based scale paths must agree with the exact operators where their
contracts promise it (full probe == brute force, identical vectors
always found)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import ivf, similarity


def _clustered_vectors(n_clusters=3, per_cluster=20, dim=8, seed=11):
    """Well-separated clusters: orthogonal-ish anchor axes + small
    deterministic jitter."""
    rng = random.Random(seed)
    rows = []
    for c in range(n_clusters):
        anchor = [0.0] * dim
        anchor[c] = 10.0
        anchor[(c + 3) % dim] = 5.0
        for i in range(per_cluster):
            vec = [a + rng.uniform(-0.5, 0.5) for a in anchor]
            rows.append((c * 1000 + i, vec, c))
    return rows


@pytest.fixture(scope="module")
def clustered(spark):
    rows = _clustered_vectors()
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


@pytest.fixture(scope="module")
def centroids(clustered):
    return ivf.ivf_fit_centroids(
        clustered, "embedding", n_cells=3, seed=7, max_iter=20
    )


def test_ivf_assign_shapes_and_bounds(clustered, centroids):
    out = ivf.ivf_assign(
        clustered, "vec_id", "embedding", centroids, nprobe=2
    ).collect()
    assert len(out) == 2 * clustered.count()  # nprobe rows per vector
    cells = {r["cell"] for r in out}
    assert cells <= {0, 1, 2}
    # the 2 probed cells per vector are distinct
    seen: dict[int, set] = {}
    for r in out:
        seen.setdefault(r["id"], set()).add(r["cell"])
    assert all(len(c) == 2 for c in seen.values())


def test_ivf_full_probe_equals_exact(spark, clustered, centroids):
    """nprobe = n_cells scores every (query, corpus) pair -> must equal
    brute-force cosine_topk row-for-row (bit-identical kernel)."""
    queries = clustered.filter(F.col("vec_id") % 10 == 0)
    exact = sorted(
        map(tuple, similarity.cosine_topk(
            clustered, queries, k=4, mode="closure"
        ).collect())
    )
    full = sorted(
        map(tuple, ivf.ivf_topk(
            clustered, queries, centroids, k=4, nprobe=len(centroids)
        ).collect())
    )
    assert full == exact and len(full) > 0


def test_ivf_nprobe1_high_recall_on_separated_clusters(
    spark, clustered, centroids
):
    """With clusters far apart and k < cluster size, the exact top-k
    are in-cluster, so probing one cell should recover (nearly) all of
    them; assert recall >= 0.9 rather than equality to stay robust to
    k-means cell boundaries."""
    queries = clustered.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(
            clustered, queries, k=4, mode="closure"
        ).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf.ivf_topk(
            clustered, queries, centroids, k=4, nprobe=1
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, recall


def test_ann_lsh_multi_recall_at_default_tables(spark, clustered):
    """r10 recall floor at the documented default (n_tables=4): on
    clustered data — where the exact top-10 ARE genuinely close, the
    regime a perceptual/semantic index serves — multi-table hyperplane
    LSH must recover >= 0.9 of the exact pairs. (On structureless
    random tails recall is bounded by data geometry, not the operator:
    see tools/recall_probe.py + SCALE.md r10.)"""
    queries = clustered.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(
            clustered, queries, k=10, mode="closure"
        ).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk_lsh_multi(
            clustered, queries, k=10, n_planes=6, dim=8, n_tables=4
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, recall


def test_ivf_centroid_model_is_small(centroids):
    # the driver-side model is the coarse quantizer ONLY — n_cells×dim
    assert centroids.shape == (3, 8)
    assert all(math.isfinite(x) for row in centroids for x in row)


def test_ann_multi_table_recall_and_single_table_equivalence(spark, clustered):
    """n_tables=1 must equal the single-table join path exactly (same
    seed-7 planes); more tables can only improve each query's best
    reachable neighbor (candidate sets grow monotonically)."""
    queries = clustered.filter(F.col("vec_id") % 10 == 0)
    single = sorted(map(tuple, similarity.ann_topk_lsh(
        clustered, queries, k=3, n_planes=6, dim=8, mode="join"
    ).collect()))
    multi1 = sorted(map(tuple, similarity.ann_topk_lsh_multi(
        clustered, queries, k=3, n_planes=6, dim=8, n_tables=1
    ).collect()))
    assert multi1 == single and len(multi1) > 0

    def best(rows):
        out = {}
        for r in rows:
            q, c = r[0], r[2]
            out[q] = max(out.get(q, -2.0), c)
        return out

    multi4 = similarity.ann_topk_lsh_multi(
        clustered, queries, k=3, n_planes=6, dim=8, n_tables=4
    ).collect()
    b1, b4 = best(single), best(multi4)
    assert set(b1) <= set(b4)  # a query never loses all its candidates
    assert all(b4[q] >= b1[q] for q in b1)  # best neighbor only improves


def test_near_dup_lsh_self_blocking(spark):
    """Identical vectors always share an LSH bucket -> exact dups have
    recall 1; every reported pair must also pass the brute-force
    threshold (no false positives, scores bit-identical)."""
    rng = random.Random(3)
    dim = 16
    base = [rng.uniform(-1, 1) for _ in range(dim)]
    far = [-x for x in base]
    rows = [
        (1, base), (2, list(base)),          # exact duplicates
        (3, [x * 1.001 for x in base]),      # near-dup (same direction)
        (4, far),                            # opposite: not a dup
        (5, [rng.uniform(-1, 1) for _ in range(dim)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.near_dup_pairs_cosine_lsh(
            df, "vec_id", "embedding", threshold=0.99, n_planes=6, dim=dim
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and (2, 3) in pairs  # scaled copy: cosine 1
    assert not any(4 in p or 5 in p for p in pairs)
    # no false positives vs the keyed (single-block) exact variant
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.near_dup_pairs_cosine(
            df.withColumn("b", F.lit(1)), "vec_id", "embedding", "b",
            threshold=0.99,
        ).collect()
    }
    assert set(pairs) <= set(exact)
    assert all(exact[p] == c for p, c in pairs.items())


def test_ivf_nprobe_clamps_to_n_cells(spark, clustered, centroids):
    """nprobe larger than n_cells degrades gracefully to full probe."""
    queries = clustered.filter(F.col("vec_id") % 10 == 0)
    full = sorted(map(tuple, ivf.ivf_topk(
        clustered, queries, centroids, k=3, nprobe=len(centroids)
    ).collect()))
    over = sorted(map(tuple, ivf.ivf_topk(
        clustered, queries, centroids, k=3, nprobe=len(centroids) + 5
    ).collect()))
    assert over == full
