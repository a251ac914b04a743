"""SQ8 embedding quantization (operators/quantize.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_big_data_boutin_danre_spark.operators import quantize as qz
from projet_big_data_boutin_danre_spark.operators.similarity import cosine_topk
from projet_big_data_boutin_danre_spark.sources.readers import load_table


def test_sq8_encode_bounds_and_reconstruction(spark, sf0001):
    emb = load_table(spark, sf0001, "embeddings")
    enc = qz.sq8_encode(emb, "vec_id", "embedding")
    stats = enc.select(
        F.array_min("q").alias("qmin"),
        F.array_max("q").alias("qmax"),
        F.col("scale"),
        # max |dq - v| over the vector, via the original row join below
    )
    r = stats.agg(
        F.min("qmin"), F.max("qmax"), F.min("scale")
    ).collect()[0]
    assert r[0] >= 0 and r[1] <= 255 and r[2] > 0

    # reconstruction error is bounded by scale/2 per element
    joined = enc.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select(
        F.array_max(
            F.zip_with(
                qz.sq8_dequantize(),
                F.transform("embedding", lambda x: x.cast("double")),
                lambda a, b: F.abs(a - b),
            )
        ).alias("max_err"),
        (F.col("scale") / 2 * 1.0000001).alias("bound"),
    )
    assert joined.filter(F.col("max_err") > F.col("bound")).count() == 0


def test_sq8_constant_vector(spark):
    df = spark.createDataFrame(
        [(1, [2.5] * 8)], "vec_id long, embedding array<double>"
    )
    row = qz.sq8_encode(df, "vec_id", "embedding").select(
        "q", "mn", "scale", qz.sq8_dequantize().alias("dq")
    ).collect()[0]
    assert row["q"] == [0] * 8 and row["scale"] == 1.0
    assert row["dq"] == [2.5] * 8


def test_sq8_rescored_equals_exact_with_full_shortlist(spark, sf0001):
    """With a shortlist as big as the corpus, the re-scored result IS
    the exact brute-force answer — byte-identical ranks and scores."""
    emb = load_table(spark, sf0001, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    n = emb.count()
    exact = cosine_topk(emb, queries, k=5)
    resc = qz.sq8_cosine_topk_rescored(
        emb, queries, k=5, shortlist_mult=(n // 5) + 1
    )
    key = lambda df: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in df.collect()
    )
    assert key(exact) == key(resc)


def test_sq8_rescored_small_shortlist_recall(spark, sf0001):
    """At mult=4 the quantized shortlist recalls nearly all true
    top-5 neighbors (SQ8 distortion is ~1e-2 on unit-ish vectors),
    scores on survivors are EXACT, and the result is deterministic."""
    emb = load_table(spark, sf0001, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    resc = qz.sq8_cosine_topk_rescored(emb, queries, k=5, shortlist_mult=4)
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in resc.collect()
    }
    hits = set(got) & set(exact)
    assert len(hits) >= int(0.8 * len(exact))
    for pair in hits:  # exact re-score: scores match to the bit
        assert got[pair] == exact[pair]
    again = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in qz.sq8_cosine_topk_rescored(
            emb, queries, k=5, shortlist_mult=4
        ).collect()
    }
    assert got == again


def test_arrow_dq_bit_identical_to_column_path(spark, sf0001):
    """The fused Arrow dequantize kernel reproduces the Column-algebra
    encode+dequantize EXACTLY (same float64 op sequence) — the oracle
    checks the Column semantics, so the fast path must not drift."""
    from projet_big_data_boutin_danre_spark.operators.quantize import (
        _sq8_dq_arrow,
        sq8_dequantize,
        sq8_encode,
    )

    emb = load_table(spark, sf0001, "embeddings")
    col_dq = {
        r["vec_id"]: r["dqv"]
        for r in sq8_encode(emb, "vec_id", "embedding")
        .select("vec_id", sq8_dequantize().alias("dqv"))
        .collect()
    }
    arrow_dq = {
        r["vec_id"]: r["dqv"]
        for r in _sq8_dq_arrow(emb, "vec_id", "embedding").collect()
    }
    assert set(col_dq) == set(arrow_dq) and col_dq
    for vid, vals in col_dq.items():
        assert vals == arrow_dq[vid]  # exact double equality, no tol
