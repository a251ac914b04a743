"""Price-regression parity (``ML_ROADMAP.md:43-52`` in the reference):
the Elastic-ML "data frame analytics" regression recipe re-expressed as
Spark MLlib — features → ``VectorAssembler`` → ``LinearRegression``,
80/20 ``randomSplit`` with a fixed seed, RMSE/R² evaluation.

The reference trains on (surface, pieces, lat, lon, type_local) →
``valeur_fonciere``; here the same shape runs on any numeric feature
set. Iterative training is inherently non-SQL-expressible, so the
driver-contract entry reports metrics as a rows-only check.

Scale: MLlib LinearRegression is the distributed L-BFGS/WLS
implementation — one pass per iteration over the feature vectors, no
driver-side materialization beyond the coefficient vector.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression, LinearRegressionModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_price_model(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    seed: int = 42,
    train_fraction: float = 0.8,
) -> tuple[LinearRegressionModel, DataFrame, DataFrame]:
    """80/20 split (``ML_ROADMAP.md:47``: training_percent 80) + fit.
    Returns (model, train, test)."""
    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features"
    ).transform(df.dropna(subset=[*feature_cols, label_col]))
    train, test = assembled.randomSplit(
        [train_fraction, 1.0 - train_fraction], seed=seed
    )
    # Narrow feature sets fit the closed-form normal-equation path
    # (WLS): one distributed pass to build X'X instead of L-BFGS
    # iterations, each of which re-scans the training set.
    solver = "normal" if len(feature_cols) <= 512 else "auto"
    train = train.cache()
    model = LinearRegression(
        featuresCol="features", labelCol=label_col, regParam=0.01, solver=solver
    ).fit(train)
    return model, train, test


def price_regression_metrics(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    seed: int = 42,
) -> DataFrame:
    """Train + evaluate; one-row metrics DataFrame (rmse, r2, counts) —
    the analog of the reference's model-evaluation step
    (``ML_ROADMAP.md:49-52``)."""
    spark = df.sparkSession
    model, train, test = train_price_model(df, feature_cols, label_col, seed=seed)
    pred = model.transform(test).cache()
    try:
        rmse = RegressionEvaluator(
            labelCol=label_col, predictionCol="prediction", metricName="rmse"
        ).evaluate(pred)
        r2 = RegressionEvaluator(
            labelCol=label_col, predictionCol="prediction", metricName="r2"
        ).evaluate(pred)
        n_train, n_test = train.count(), pred.count()
    finally:
        pred.unpersist()
        train.unpersist()
    return spark.createDataFrame(
        [(float(rmse), float(r2), n_train, n_test)],
        "rmse double, r2 double, n_train bigint, n_test bigint",
    ).select(
        F.round("rmse", 2).alias("rmse"),
        F.round("r2", 4).alias("r2"),
        "n_train",
        "n_test",
    )
