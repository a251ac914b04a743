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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_price_model(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    seed: int = 42,
    train_fraction: float = 0.8,
):
    """80/20 split (``ML_ROADMAP.md:47``: training_percent 80) + fit.
    Returns (model, train, test)."""
    # Imported here, not at module top: pyspark.ml pulls in the whole
    # MLlib Python tree (~0.4s) that the closed-form metrics path below
    # never needs.
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

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


def train_price_model_gbt(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    seed: int = 42,
    train_fraction: float = 0.8,
    max_iter: int = 20,
    max_depth: int = 5,
):
    """The ML_ROADMAP's second model (``ML_ROADMAP.md``: GBT after the
    linear baseline): gradient-boosted trees on the same feature
    assembly and 80/20 split. Returns (model, train, test).

    Scale: MLlib GBT is the distributed boosting implementation —
    each iteration is a full pass over the cached training set, so
    ``max_iter`` bounds total scans; depth-bounded trees keep the
    per-pass histogram state small. No driver-side data movement
    beyond the fitted tree ensemble (model state, like IVF's
    centroids)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features"
    ).transform(df.dropna(subset=[*feature_cols, label_col]))
    train, test = assembled.randomSplit(
        [train_fraction, 1.0 - train_fraction], seed=seed
    )
    train = train.cache()
    model = GBTRegressor(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        maxDepth=max_depth,
        seed=seed,
    ).fit(train)
    return model, train, test


def hash_split_flag(key_cols: Sequence[str], threshold_256: int = 205) -> "F.Column":
    """Deterministic train/test split flag, reproducible in any SQL
    engine (unlike ``F.rand(seed)`` / ``randomSplit``, whose streams
    are Spark-private): take the first byte of md5 over the
    '-'-joined key columns and compare against ``threshold_256``
    (205/256 ≈ 80.08% train). Row-local, no shuffle, stable under
    repartitioning — the property a reproducible 100 TB split needs."""
    key = F.concat_ws("-", *[F.col(c).cast("string") for c in key_cols])
    byte = F.conv(F.substring(F.md5(key), 1, 2), 16, 10).cast("int")
    return byte < F.lit(threshold_256)


def price_regression_exact(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    key_cols: Sequence[str],
    reg_param: float = 0.01,
    threshold_256: int = 205,
) -> DataFrame:
    """Single-feature ridge regression (intercept unpenalized) with a
    fully cross-engine-checkable result: one-row metrics DataFrame
    (rmse, r2, n_train, n_test) — the hash-checkable twin of
    ``price_regression_metrics`` (``ML_ROADMAP.md:43-52`` parity).

    Everything stays in the plan — no driver collect at all:
    1. Deterministic md5 split flag (``hash_split_flag``).
    2. Sufficient statistics as EXACT integer/decimal sums: the
       feature as BIGINT, the label in integer cents, Σy² in
       DECIMAL(38,0) (BIGINT would overflow beyond ~100k rows).
       Exact moments mean both engines derive bit-identical doubles,
       so the closed-form algebra below matches the oracle exactly —
       float Σ order across partitions can never diverge.
    3. Closed-form 2×2 ridge solve + moment-form test metrics
       (SSE = y'y − 2β·X'y + β'X'Xβ) as plain double expressions.
    One conditional-aggregation pass over the table (map-side
    combined), a 1-row final projection — as scalable as any
    groupBy-sum at 100 TB."""
    x = F.col(feature_col)
    y = F.col(label_col)
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        x.cast("bigint").alias("xq"),
        F.round(y * 100).cast("bigint").alias("yc"),
        hash_split_flag(key_cols, threshold_256).alias("is_train"),
    )

    def _sums(train: bool):
        cond = F.col("is_train") if train else ~F.col("is_train")
        tag = "tr" if train else "te"
        z = F.lit(0).cast("bigint")
        zd = F.lit(0).cast("decimal(38,0)")
        return [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{tag}"),
            F.sum(F.when(cond, F.col("xq")).otherwise(z)).alias(f"sx_{tag}"),
            F.sum(
                F.when(cond, F.col("xq") * F.col("xq")).otherwise(z)
            ).alias(f"sxx_{tag}"),
            F.sum(F.when(cond, F.col("yc")).otherwise(z)).alias(f"sy_{tag}"),
            F.sum(
                F.when(cond, F.col("xq") * F.col("yc")).otherwise(z)
            ).alias(f"sxy_{tag}"),
            F.sum(
                F.when(
                    cond, (F.col("yc") * F.col("yc")).cast("decimal(38,0)")
                ).otherwise(zd)
            ).alias(f"syy_{tag}"),
        ]

    moments = base.agg(*_sums(True), *_sums(False))
    # The metric algebra is written as ONE selectExpr whose text is
    # mirror-imaged in the DuckDB oracle (__spark_entry__) so the
    # double expression trees are operation-for-operation identical.
    lam = repr(float(reg_param))
    algebra = f"""
        CAST(n_tr AS DOUBLE) AS dn,
        CAST(sx_tr AS DOUBLE) AS dsx,
        CAST(sxx_tr AS DOUBLE) AS dsxx,
        CAST(sy_tr AS DOUBLE) / 100.0 AS dsy,
        CAST(sxy_tr AS DOUBLE) / 100.0 AS dsxy,
        CAST(n_te AS DOUBLE) AS tn,
        CAST(sx_te AS DOUBLE) AS tsx,
        CAST(sxx_te AS DOUBLE) AS tsxx,
        CAST(sy_te AS DOUBLE) / 100.0 AS tsy,
        CAST(sxy_te AS DOUBLE) / 100.0 AS tsxy,
        CAST(syy_te AS DOUBLE) / 10000.0 AS tsyy,
        n_tr, n_te
    """
    beta = f"""
        (dn * (dsxx + {lam}) - dsx * dsx) AS det,
        (dn * dsxy - dsx * dsy) / (dn * (dsxx + {lam}) - dsx * dsx) AS b1,
        ((dsxx + {lam}) * dsy - dsx * dsxy)
            / (dn * (dsxx + {lam}) - dsx * dsx) AS b0
    """
    sse = (
        "tsyy - 2.0 * (b0 * tsy + b1 * tsxy)"
        " + (b0 * b0 * tn + 2.0 * b0 * b1 * tsx + b1 * b1 * tsxx)"
    )
    final = f"""
        round(CASE WHEN n_te > 0 AND n_tr > 0
              THEN sqrt(greatest({sse}, 0.0) / tn) END, 2) AS rmse,
        round(CASE WHEN n_te > 0 AND n_tr > 0
                    AND tsyy - tsy * tsy / tn > 0
              THEN 1.0 - greatest({sse}, 0.0) / (tsyy - tsy * tsy / tn)
              END, 4) AS r2,
        CAST(n_tr AS BIGINT) AS n_train,
        CAST(n_te AS BIGINT) AS n_test
    """
    return (
        moments.selectExpr(*_split_exprs(algebra))
        .selectExpr("*", *_split_exprs(beta))
        .selectExpr(*_split_exprs(final))
    )


def _split_exprs(block: str) -> list[str]:
    """Split a comma-separated SQL projection block into expressions
    (top-level commas only)."""
    out, depth, cur = [], 0, []
    for ch in block:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


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
    directly. ONE codegen'd aggregation pass over the table, grouped by
    the seeded train/test split flag, collects per-split sufficient
    statistics (n, X'X, X'y, Σy²); everything downstream is driver-side
    algebra on the tiny (k+1)² block: solve the train system for β,
    then test SSE = y'y − 2β·X'y + β'(X'X)β — no second scan needed,
    because the residual sum is itself a function of the same moments.
    All map-side-combining sums — no MLlib fit/evaluator overhead (~6
    scans + Py4J per-iteration chatter), no caching needed, and the
    shape is exactly as scalable as any groupBy-sum at 100 TB.
    Intercept is unpenalized; features are not standardized (the ridge
    term applies to raw-scale coefficients)."""
    import numpy as np

    spark = df.sparkSession
    # Seeded rand() flag instead of randomSplit: same per-partition
    # determinism guarantee, but randomSplit inserts a
    # sortWithinPartitions over ALL columns on every branch (two full
    # sorts of the table per evaluation) to pin row order.
    # Projected via withColumn (not inline in groupBy): Catalyst
    # rejects nondeterministic expressions like rand() in grouping
    # keys, but grouping by the projected column is fine.
    clean = df.dropna(subset=[*feature_cols, label_col]).withColumn(
        "is_train", F.rand(seed) < train_fraction
    )

    k = len(feature_cols)
    # The O(k²) moment expressions are built as ONE selectExpr string
    # list, not F.sum(F.col(..)*F.col(..)) algebra: every Column
    # construction is a Py4J round-trip, and ~40 of them cost ~0.5s of
    # driver latency before the query even plans.
    xs = ["1.0D"] + [f"double(`{c}`)" for c in feature_cols]
    y = f"double(`{label_col}`)"
    aggs = [f"count(1) AS n", f"sum({y} * {y}) AS yy"]
    for i in range(k + 1):
        for j in range(i, k + 1):
            aggs.append(f"sum({xs[i]} * {xs[j]}) AS xx_{i}_{j}")
        aggs.append(f"sum({xs[i]} * {y}) AS xy_{i}")
    view = f"__price_reg_stats_{abs(id(df))}"
    clean.createOrReplaceTempView(view)
    try:
        split_stats = {
            row["is_train"]: row
            for row in spark.sql(
                f"SELECT is_train, {', '.join(aggs)}"
                f" FROM {view} GROUP BY is_train"
            ).collect()
        }
    finally:
        spark.catalog.dropTempView(view)

    def _moments(row):
        xtx = np.zeros((k + 1, k + 1))
        xty = np.zeros(k + 1)
        for i in range(k + 1):
            for j in range(i, k + 1):
                xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"]
            xty[i] = row[f"xy_{i}"]
        return xtx, xty

    def _result(rmse, r2, n_train, n_test):
        # One-row literal result via spark.sql, not createDataFrame:
        # the local-relation conversion path costs >1s on first use in
        # a session. round() stays SQL-side (HALF_UP) so the values
        # match what the previous F.round formulation produced.
        def d(v):
            if v is None or not math.isfinite(float(v)):
                return "CAST(NULL AS double)"
            # string-cast, not a bare literal: un-suffixed decimal
            # literals parse as DecimalType and would change the
            # result schema; repr() round-trips doubles exactly.
            return f"CAST('{float(v)!r}' AS double)"

        return spark.sql(
            f"SELECT round({d(rmse)}, 2) AS rmse,"
            f" round({d(r2)}, 4) AS r2,"
            f" {int(n_train)}L AS n_train, {int(n_test)}L AS n_test"
        )

    tr, te = split_stats.get(True), split_stats.get(False)
    n_train = tr["n"] if tr else 0
    n_test = te["n"] if te else 0
    if n_train == 0:
        return _result(None, None, 0, n_test)
    xtx, xty = _moments(tr)
    penalty = reg_param * np.eye(k + 1)
    penalty[0, 0] = 0.0  # intercept unpenalized
    try:
        beta = np.linalg.solve(xtx + penalty, xty)
    except np.linalg.LinAlgError:
        beta = np.linalg.lstsq(xtx + penalty, xty, rcond=None)[0]

    if n_test == 0:
        rmse, r2 = None, None
    else:
        txtx, txty = _moments(te)
        # max(0, ·): the moment form can go slightly negative from
        # cancellation when the fit is near-exact.
        sse = max(
            0.0, float(te["yy"] - 2.0 * beta @ txty + beta @ txtx @ beta)
        )
        rmse = math.sqrt(sse / n_test)
        sy = float(txty[0])  # Σ(x_0 · y) with x_0 ≡ 1
        sst = te["yy"] - sy * sy / n_test
        r2 = 1.0 - sse / sst if sst > 0 else None
    return _result(rmse, r2, n_train, n_test)
