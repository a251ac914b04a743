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

import math
from collections.abc import Sequence

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
    reg_param: float = 0.01,
    train_fraction: float = 0.8,
) -> DataFrame:
    """Train + evaluate; one-row metrics DataFrame (rmse, r2, counts) —
    the analog of the reference's model-evaluation step
    (``ML_ROADMAP.md:49-52``).

    The fit is the closed-form ridge/normal-equation solve — the same
    math MLlib's ``LinearRegression(solver='normal')`` runs, expressed
    directly: ONE codegen'd aggregation pass over train collects the
    (k+1)×(k+1) sufficient statistics (X'X, X'y), the tiny symmetric
    system is solved driver-side, and ONE pass over test computes
    rmse/r² from (n, Σ(y-ŷ)², Σy, Σy²). Two scans total, all
    map-side-combining sums — no MLlib fit/evaluator overhead (~6
    scans + Py4J per-iteration chatter), no caching needed, and the
    shape is exactly as scalable as any groupBy-sum at 100 TB.
    Intercept is unpenalized; features are not standardized (the ridge
    term applies to raw-scale coefficients)."""
    import numpy as np

    spark = df.sparkSession
    clean = df.dropna(subset=[*feature_cols, label_col]).withColumn(
        "__r", F.rand(seed)
    )
    # Seeded rand() split instead of randomSplit: same per-partition
    # determinism guarantee, but randomSplit inserts a
    # sortWithinPartitions over ALL columns on every branch (two full
    # sorts of the table per evaluation) to pin row order — a pure
    # filter re-evaluates the seeded rand stream instead, so each
    # branch is one scan with the predicate pushed into it.
    train = clean.filter(F.col("__r") < train_fraction)
    test = clean.filter(F.col("__r") >= train_fraction)

    k = len(feature_cols)
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k + 1):
        for j in range(i, k + 1):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"xx_{i}_{j}"))
        aggs.append(F.sum(xs[i] * y).alias(f"xy_{i}"))
    stats = train.agg(*aggs).collect()[0]

    n_train = stats["n"]
    if n_train == 0:
        return spark.createDataFrame(
            [(None, None, 0, 0)],
            "rmse double, r2 double, n_train bigint, n_test bigint",
        )
    xtx = np.zeros((k + 1, k + 1))
    xty = np.zeros(k + 1)
    for i in range(k + 1):
        for j in range(i, k + 1):
            xtx[i, j] = xtx[j, i] = stats[f"xx_{i}_{j}"]
        xty[i] = stats[f"xy_{i}"]
    penalty = reg_param * np.eye(k + 1)
    penalty[0, 0] = 0.0  # intercept unpenalized
    try:
        beta = np.linalg.solve(xtx + penalty, xty)
    except np.linalg.LinAlgError:
        beta = np.linalg.lstsq(xtx + penalty, xty, rcond=None)[0]

    pred = F.lit(float(beta[0]))
    for c, b in zip(feature_cols, beta[1:]):
        pred = pred + F.col(c).cast("double") * F.lit(float(b))
    m = test.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((y - pred) * (y - pred)).alias("sse"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
    ).collect()[0]
    n_test = m["n"]
    if n_test == 0:
        rmse, r2 = None, None
    else:
        rmse = math.sqrt(m["sse"] / n_test)
        sst = m["syy"] - m["sy"] * m["sy"] / n_test
        r2 = 1.0 - m["sse"] / sst if sst > 0 else None
    return spark.createDataFrame(
        [(rmse, r2, n_train, n_test)],
        "rmse double, r2 double, n_train bigint, n_test bigint",
    ).select(
        F.round("rmse", 2).alias("rmse"),
        F.round("r2", 4).alias("r2"),
        "n_train",
        "n_test",
    )
