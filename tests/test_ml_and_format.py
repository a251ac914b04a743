"""Tests for the MLlib regression parity module and the raw→formatted
ad pipeline (format_ads)."""

from __future__ import annotations

import pyspark.sql.functions as F

from projet_big_data_boutin_danre_spark.ml import price_regression_metrics
from projet_big_data_boutin_danre_spark.operators import cleaning


def test_price_regression_learns_linear_signal(spark):
    # price = 10*q + 3*d + noise-free -> near-perfect fit expected
    rows = [(float(q), float(d), 10.0 * q + 3.0 * d) for q in range(20) for d in range(5)]
    df = spark.createDataFrame(rows, "q double, d double, price double")
    out = price_regression_metrics(df, ["q", "d"], "price", seed=1).collect()[0]
    assert out.r2 > 0.999
    assert out.rmse < 1.0
    assert out.n_train + out.n_test == 100


def test_format_ads_pipeline(spark):
    rows = [
        # full record
        ('{"list_id": 7, "subject": "ad one", "price_cents": [12345], '
         '"date": "2024-03-01 10:00:00", '
         '"location": {"city":"Paris","zipcode":"75001","lat":48.8,"lng":2.3}, '
         '"attributes": [{"key":"seg","value":"A"}]}',),
        # N/A location, zero price, bad date
        ('{"list_id": 8, "subject": "ad two", "price_cents": [0], '
         '"date": "bad", "location": "N/A", '
         '"attributes": [{"key":"seg","value":"B"}]}',),
    ]
    df = spark.createDataFrame(rows, "raw_json string")
    out = {r.id: r for r in cleaning.format_ads(df).collect()}
    assert out[7].price == 123.45
    assert out[7].city == "Paris" and out[7].zipcode == "75001"
    assert out[7].seg == "A"
    assert str(out[7].date).startswith("2024-03-01 10:00:00")
    assert out[8].price is None  # 0 cents -> null (reference semantics)
    assert out[8].city is None and out[8].zipcode is None  # N/A -> null struct
    assert out[8].date is None  # coercing parse


def test_mllib_training_paths_fit_and_predict(spark):
    """SURVEY §7 step 8 (ML_ROADMAP parity): both MLlib models — the
    LinearRegression baseline and the GBT follow-up — fit on the same
    feature assembly + seeded 80/20 split and produce finite
    predictions on the held-out side. (The graded regression numbers
    come from the closed-form path, price_regression; this pins the
    MLlib train/serve plumbing itself.)"""
    from pyspark.ml.evaluation import RegressionEvaluator

    from projet_big_data_boutin_danre_spark.ml import (
        train_price_model,
        train_price_model_gbt,
    )

    # y = 3*a + 2*b + noise-free: both models should fit near-perfectly
    df = spark.range(200).select(
        (F.col("id") % 17).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
        ((F.col("id") % 17) * 3.0 + (F.col("id") % 7) * 2.0).alias("y"),
    )
    for trainer in (train_price_model, train_price_model_gbt):
        model, train, test = trainer(df, ["a", "b"], "y", seed=42)
        assert train.count() + test.count() == 200
        preds = model.transform(test)
        rmse = RegressionEvaluator(
            labelCol="y", predictionCol="prediction", metricName="rmse"
        ).evaluate(preds)
        assert rmse == rmse and rmse < 10.0  # finite and sane


def test_quality_classifier_learns_the_heuristic(spark, sf0001):
    """Weak-supervised TF-IDF+LogReg quality model: fits on the md5
    80/20 split, beats coin-flip by a wide margin on held-out teacher
    labels, and scores the full corpus with a shuffle-free map."""
    from projet_big_data_boutin_danre_spark.ml.quality_model import (
        train_quality_model,
    )
    from projet_big_data_boutin_danre_spark.sources.readers import load_table

    docs = load_table(spark, sf0001, "documents")
    qm = train_quality_model(docs, threshold=0.5)
    assert qm.n_train > 0 and qm.n_test > 0
    # ~80/20 split (md5 first byte < 205/256)
    frac = qm.n_train / (qm.n_train + qm.n_test)
    assert 0.7 < frac < 0.9
    assert qm.auc > 0.7, f"AUC {qm.auc} — feature path broken?"

    scored = qm.score(docs, "doc_id", "text")
    rows = scored.collect()
    assert all(0.0 <= r["p_quality"] <= 1.0 for r in rows)
    # deterministic: same fitted model scores identically twice
    again = {r["doc_id"]: r["p_quality"] for r in qm.score(docs, "doc_id", "text").collect()}
    assert {r["doc_id"]: r["p_quality"] for r in rows} == again
