"""IVF (inverted-file) approximate nearest neighbor (engine extension).

The data-adaptive companion to the random-hyperplane LSH path
(``operators/similarity.py``): a coarse quantizer (seeded k-means)
partitions the corpus into cells; a query scores only the vectors in
its ``nprobe`` nearest cells. Recall/latency trade is explicit:
``nprobe = n_cells`` degenerates to exact brute force (every pair
scored), ``nprobe = 1`` scans ~1/n_cells of the corpus.

Scale design:
- The centroid table is DRIVER-SIDE BY DESIGN — like every IVF
  implementation, the coarse quantizer is a tiny model (n_cells ×
  dim floats, ~64 KB at 256 cells × 64 dims) shipped in task
  closures exactly like the LSH plane literals. The *corpus* never
  leaves the executors.
- Cell assignment is one Arrow-batched ``mapInPandas`` projection —
  no shuffle. The search itself is ONE shuffle per side keyed by
  cell (``cogroup``), the same shape as ``ann_topk_lsh_join``:
  corpus and query vectors each cross the wire once.
- Scores use the sequential-fold kernels from ``similarity.py``, so
  any pair scored by IVF gets the bit-identical cosine the exact
  paths produce — with ``nprobe = n_cells`` the result EQUALS
  ``cosine_topk`` row-for-row (tested).
- The k-means fit is the one iterative step (MLlib, seeded); it runs
  once per corpus snapshot and is reused across queries — train/
  serve separation, like any index build.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import (
    _as_double_array,
    _rank_topk,
    _seq_dot_cross,
    _seq_sq_norms,
)


def ivf_fit_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 7,
    max_iter: int = 5,
) -> np.ndarray:
    """Fit the coarse quantizer: seeded k-means over L2-normalized
    vectors (spherical k-means, so euclidean cells align with the
    cosine metric used at search time). Returns the (n_cells, dim)
    centroid matrix — the tiny driver-side model every IVF index has."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = _as_double_array(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(v, lambda x: x / norm)
    feats = (
        df.select(unit.alias("__arr"))
        .filter(F.col("__arr").isNotNull() & (norm > 0))
        .select(array_to_vector("__arr").alias("__f"))
    )
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, featuresCol="__f"
    ).fit(feats)
    # clusterCenters() yields numpy arrays (Spark 4) or MLlib Vectors
    # (older releases) — normalize either
    return np.array(
        [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    )


def _cell_ranks(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Per row, cell indices sorted by descending cosine to the
    centroid (sequential-fold norms for engine-wide determinism)."""
    c_norms = _seq_sq_norms(centroids)
    v_norms = _seq_sq_norms(m)
    cos = _seq_dot_cross(m, centroids) / (
        v_norms[:, None] * c_norms[None, :]
    )
    # stable argsort on -cos: ties break by cell id ascending —
    # deterministic under any centroid order
    return np.argsort(-cos, axis=1, kind="stable")


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    out_id: str = "id",
    out_vec: str = "v",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector its ``nprobe`` nearest cells (by cosine to
    the centroid): one Arrow-batched projection, no shuffle. Output:
    (out_id, out_vec, cell) with ``nprobe`` rows per vector."""
    cents = np.asarray(centroids, dtype=np.float64)
    # more probes than cells = full probe; clamping keeps the repeat/
    # ravel column lengths consistent instead of erroring
    nprobe = min(nprobe, len(cents))
    base = df.select(
        F.col(id_col).alias(out_id), _as_double_array(vec_col).alias(out_vec)
    ).filter(F.col(out_id).isNotNull() & F.col(out_vec).isNotNull())
    id_type = df.schema[id_col].dataType.simpleString()

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[out_vec].tolist(), dtype=np.float64)
            cells = _cell_ranks(m, cents)[:, :nprobe]
            yield pd.DataFrame(
                {
                    out_id: np.repeat(pdf[out_id].to_numpy(), nprobe),
                    out_vec: [
                        v for v in pdf[out_vec] for _ in range(nprobe)
                    ],
                    "cell": cells.ravel().astype(np.int32),
                }
            )

    return base.mapInPandas(
        _assign, schema=f"{out_id} {id_type}, {out_vec} array<double>, cell int"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """IVF search: score each query against the corpus vectors in its
    ``nprobe`` nearest cells only. Same output contract as the other
    top-k paths: (query_id, neighbor_id, cosine, rank), self-matches
    excluded, total-order ranking.

    Plan: corpus assigned to its 1 home cell, queries replicated to
    their ``nprobe`` probe cells (bounded fan-out, ``nprobe`` ≪
    n_cells), then ``cogroup`` on the cell and the shared numpy
    kernel — one bounded shuffle per side, no driver collect of
    either vector table."""
    c = ivf_assign(corpus, id_col, vec_col, centroids, "neighbor_id", "cv", 1)
    q = ivf_assign(queries, id_col, vec_col, centroids, "query_id", "qv", nprobe)
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, cosine double"

    def _score(cpdf: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cpdf) or not len(qpdf):
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        cm = np.array(cpdf["cv"].tolist(), dtype=np.float64)
        qm = np.array(qpdf["qv"].tolist(), dtype=np.float64)
        c_norms = _seq_sq_norms(cm)
        q_norms = _seq_sq_norms(qm)
        cos = _seq_dot_cross(cm, qm) / (c_norms[:, None] * q_norms[None, :])
        n_c, n_q = cos.shape
        nb = np.repeat(cpdf["neighbor_id"].to_numpy(), n_q)
        qi = np.tile(qpdf["query_id"].to_numpy(), n_c)
        keep = nb != qi
        return pd.DataFrame(
            {
                "query_id": qi[keep],
                "neighbor_id": nb[keep],
                "cosine": cos.ravel()[keep],
            }
        )

    scored = (
        c.groupBy("cell")
        .cogroup(q.groupBy("cell"))
        .applyInPandas(_score, schema=out_schema)
    )
    # no dedup needed: each corpus vector lives in exactly ONE home
    # cell, so a (query, neighbor) pair is scored at most once
    return _rank_topk(scored, k, round_to)
