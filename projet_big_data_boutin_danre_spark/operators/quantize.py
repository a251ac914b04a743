"""Scalar (int8-range) embedding quantization — the standard memory
lever for 100 TB vector stores.

A float32 64-dim embedding is 256 B; the SQ8 code is 64 B + two
scalars — 4× less shuffle/scan/cache traffic for vector workloads.
The production pattern implemented here is **quantized shortlist +
exact re-score**: score candidates on dequantized codes (cheap,
approximate), take an over-fetched shortlist per query, then recompute
EXACT scores for just the shortlist on the original floats and
re-rank. The final answer is top-k-exact whenever the shortlist
recalls the true top-k; both stages are deterministic, so the whole
two-stage result is a pure function of the data and is checked
bit-for-bit against the DuckDB oracle (same quantize → same shortlist
→ same re-score, no recall tolerance needed).

Encoding (per vector, min-max affine):

    mn = min(v); mx = max(v)
    scale = (mx - mn) / 255     (1.0 when the vector is constant)
    q_i  = floor((v_i - mn) / scale + 0.5)   ∈ [0, 255]
    dq_i = mn + q_i * scale

Every step is plain Column algebra (``transform``/``array_min``) —
JVM-side, codegen-friendly, and expressible verbatim in ANSI SQL
(``list_transform``/``list_aggregate``), which is what makes the
oracle exact. No UDFs, no collect.

Scale: encode is a narrow map (combines with the scan). The shortlist
stage has the same join topology as the chosen exact kernel
(closure/cogroup/grid — it reuses ``similarity.cosine_topk``), just
over 4× smaller vectors; the re-score stage joins the shortlist
(|Q|·k·mult rows) back to the float table twice — two broadcast-or-
shuffle equi-joins bounded by the shortlist size, never by |corpus|².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double_array, cosine, cosine_topk

__all__ = ["sq8_encode", "sq8_dequantize", "sq8_cosine_topk_rescored"]


def sq8_encode(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec) → (id, q: array<int> in [0,255], mn, scale).

    NULL ids/vectors are dropped (parity with the exact kernels).
    Constant vectors get scale=1.0 so every code is 0 and dequantize
    reproduces ``mn`` exactly — no epsilon, bit-stable in both
    engines.

    The min/max/scale scalars are materialized as real columns BEFORE
    the per-element encode lambda references them: a lambda capturing
    a nested ``array_min(transform(...))`` expression re-evaluates it
    per element — O(dim²) interpreted work per row (measured ~6×
    slow-down at dim=64)."""
    staged = (
        df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(F.col(id_col), _as_double_array(vec_col).alias("__v"))
        .select(
            id_col,
            "__v",
            F.array_min("__v").alias("mn"),
            F.array_max("__v").alias("mx"),
        )
        .select(
            id_col,
            "__v",
            "mn",
            F.when(
                F.col("mx") > F.col("mn"),
                (F.col("mx") - F.col("mn")) / F.lit(255.0),
            )
            .otherwise(F.lit(1.0))
            .alias("scale"),
        )
    )
    mn, scale = F.col("mn"), F.col("scale")
    return staged.select(
        F.col(id_col),
        F.transform(
            "__v",
            lambda x: F.floor((x - mn) / scale + F.lit(0.5)).cast("int"),
        ).alias("q"),
        "mn",
        "scale",
    )


def sq8_dequantize(
    q: Column | str = "q", mn: Column | str = "mn", scale: Column | str = "scale"
) -> Column:
    """Codes → approximate double vector: ``mn + q * scale`` per
    element (the exact inverse of the encode rounding grid)."""
    qc = F.col(q) if isinstance(q, str) else q
    mnc = F.col(mn) if isinstance(mn, str) else mn
    sc = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(qc, lambda x: mnc + x.cast("double") * sc)


def _sq8_dq_arrow(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec) → (id, dqv): encode+dequantize fused in one Arrow
    ``mapInPandas`` numpy kernel. Bit-identical to
    ``sq8_encode``+``sq8_dequantize`` (same float64 op sequence:
    min/max, divide, floor(+0.5), mul, add — pinned by
    ``tests/test_quantize.py::test_arrow_dq_bit_identical``) but ~20×
    cheaper: interpreted per-element HOF lambdas cost microseconds per
    element; the numpy kernel runs the whole batch vectorized (same
    trade as ``similarity._bucketed_side``)."""
    import numpy as np
    import pandas as pd

    # carry the caller's id type through the Arrow boundary — a
    # hardcoded long would crash (or silently coerce) string/decimal
    # ids and break the joins back to the float table
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, dqv array<double>"

    def _dq(batches):
        for pdf in batches:
            dqs = []
            for v in pdf[vec_col]:
                a = np.asarray(v, dtype=np.float64)
                mn = a.min()
                mx = a.max()
                s = (mx - mn) / 255.0 if mx > mn else 1.0
                dqs.append(mn + np.floor((a - mn) / s + 0.5) * s)
            yield pd.DataFrame({id_col: pdf[id_col], "dqv": dqs})

    return (
        df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(F.col(id_col), F.col(vec_col))
        .mapInPandas(_dq, schema=out_schema)
    )


def sq8_cosine_topk_rescored(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist_mult: int = 4,
    round_to: int = 6,
    mode: str = "auto",
) -> DataFrame:
    """Two-stage exact-shape ANN: quantized shortlist (k·mult per
    query, scored on dequantized SQ8 codes) → exact re-score of the
    shortlist on the original floats → top-k.

    Output: (query_id, neighbor_id, cosine, rank) — same contract as
    ``similarity.cosine_topk``; ``cosine`` is the EXACT score. Raising
    ``shortlist_mult`` trades shortlist cost for recall; the result is
    deterministic at every setting (ties broken by neighbor id in both
    stages)."""
    enc_c = _sq8_dq_arrow(corpus, id_col, vec_col)
    enc_q = _sq8_dq_arrow(queries, id_col, vec_col)
    shortlist = cosine_topk(
        enc_c,
        enc_q,
        id_col=id_col,
        vec_col="dqv",
        k=k * shortlist_mult,
        round_to=round_to,
        mode=mode,
    ).select("query_id", "neighbor_id")

    cf = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double_array(vec_col).alias("cv"),
    )
    qf = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double_array(vec_col).alias("qv"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        shortlist.join(cf, "neighbor_id")
        .join(qf, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias(
                "cosine"
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
