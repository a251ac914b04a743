"""Model-based document quality scoring (engine extension for the
LLM-data roadmap; the heuristic sibling is ``operators/text.py:
quality_score``).

The standard corpus-pipeline pattern: a cheap heuristic (length /
punctuation / stopword ratios) labels an initial corpus slice, a
lightweight classifier generalizes it (picking up vocabulary signals
the heuristic can't see), and the classifier's probability becomes the
quality gate for the full corpus. This module implements that loop
with MLlib primitives only:

    tokens → HashingTF(2^k features) → IDF → LogisticRegression

Scale: HashingTF is stateless (a hash per token — no vocabulary to
build or broadcast, the property that makes it the right featurizer at
100 TB); IDF needs one aggregate pass; LogisticRegression is MLlib's
distributed L-BFGS (treeAggregate gradients). Scoring is a narrow map
with the (tiny) coefficient vector broadcast in the model — no shuffle.

Like ``regression.train_price_model``, the train/test split is the
deterministic md5-based ``hash_split_flag`` — a pure function of the
id, so re-runs produce identical splits (no RNG state; same rationale
as operators/corpus_prep.py).

The iterative fit has no SQL twin, so this stays pytest-verified
(fit metrics + reproducibility), like the IVF k-means fit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import quality_score, tokens


@dataclass
class QualityModel:
    """Fitted artifacts + held-out metrics."""

    pipeline_model: object  # pyspark.ml.PipelineModel
    threshold: float        # weak-label cut on the heuristic score
    auc: float              # held-out area under ROC
    n_train: int
    n_test: int

    def score(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """(id, p_quality): the classifier's keep-probability per doc.
        Broadcast-coefficient narrow map — no shuffle."""
        from pyspark.ml.functions import vector_to_array

        feats = _features(docs, id_col, text_col)
        scored = self.pipeline_model.transform(feats)
        return scored.select(
            F.col(id_col),
            # VectorUDT -> array, second element = P(label=1)
            F.element_at(vector_to_array("probability"), 2).alias(
                "p_quality"
            ),
        )


def _features(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        tokens(text_col).alias("toks"),
        quality_score(text_col).alias("__q"),
    ).filter(F.size("toks") > 0)


def train_quality_model(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_features: int = 1 << 12,
    max_iter: int = 25,
    reg_param: float = 0.01,
) -> QualityModel:
    """Fit the weak-supervised quality classifier.

    Labels: ``quality_score(text) >= threshold`` (the heuristic as
    teacher). Split: deterministic 80/20 md5 split on the id (exact
    reference parity with ``regression.hash_split_flag``). Returns the
    fitted model plus held-out AUC — a fit that can't beat coin-flip
    AUC on its own teacher labels indicates a broken feature path, so
    the test suite gates on it."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import IDF, HashingTF

    from .regression import hash_split_flag

    feats = _features(docs, id_col, text_col).withColumn(
        "label", (F.col("__q") >= F.lit(threshold)).cast("double")
    ).withColumn("is_train", hash_split_flag([id_col]))

    train = feats.filter(F.col("is_train"))
    test = feats.filter(~F.col("is_train"))
    # guard BEFORE fitting: an empty split (tiny corpora — the md5
    # byte split is deterministic per id, so a handful of docs can
    # all land on one side) would otherwise surface as an opaque
    # MLlib 'requirement failed' deep inside LogisticRegression/IDF,
    # or feed the evaluator nothing
    n_train, n_test = train.count(), test.count()
    if n_train == 0 or n_test == 0:
        raise ValueError(
            f"quality-model split is degenerate (train={n_train}, "
            f"test={n_test}) — the corpus is too small for the 80/20 "
            "md5 split; gate it heuristically instead (quality_score) "
            "or train on a larger slice"
        )

    pipe = Pipeline(
        stages=[
            HashingTF(
                inputCol="toks", outputCol="tf", numFeatures=n_features
            ),
            IDF(inputCol="tf", outputCol="features"),
            LogisticRegression(
                maxIter=max_iter, regParam=reg_param, featuresCol="features"
            ),
        ]
    )
    model = pipe.fit(train)
    scored_test = model.transform(test)
    auc = BinaryClassificationEvaluator(
        metricName="areaUnderROC"
    ).evaluate(scored_test)
    return QualityModel(
        pipeline_model=model,
        threshold=threshold,
        auc=float(auc),
        n_train=n_train,
        n_test=n_test,
    )
