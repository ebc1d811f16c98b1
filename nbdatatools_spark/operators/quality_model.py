"""Model-based quality filtering (SURVEY §7.8 training-data extension).

The classifier-based corpus filter used by the major pretraining pipelines:
train a linear model to separate a high-quality reference corpus from raw
crawl, then keep (or importance-sample) documents the model scores as
reference-like (GPT-3 appendix A's logistic filter over CommonCrawl;
CCNet §4.3; the "fasttext quality classifier" of several open corpora).

Spark-first shape:

- features are hashed bag-of-words (``HashingTF`` over the whitespace
  tokens — fixed-width sparse vectors, no vocabulary state to ship);
- ``LogisticRegression`` (MLlib DataFrame API) trains distributedly;
- scoring is ``model.transform`` — JVM-side, map-only, no Python in the
  per-row path; the keep decision is a plain Column predicate on the
  positive-class probability.

The statistical cousin of DSIR (importance.py) — DSIR reweights by an
n-gram likelihood ratio with a closed-form model; this learns a
discriminative boundary. Both appear in real pipelines, often together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _featurize(df: DataFrame, text_col: str, num_features: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    from ..functions.text import normalize_text

    toks = df.withColumn("__tokens", F.split(normalize_text(F.col(text_col)), " "))
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features", numFeatures=num_features
    )
    return tf.transform(toks).drop("__tokens")


def train_quality_filter(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 15,
    max_iter: int = 30,
    reg_param: float = 1e-3,
):
    """Train the reference-vs-crawl classifier. Returns the fitted
    LogisticRegressionModel (coefficients live on the driver, bounded by
    ``num_features``; training is distributed)."""
    from pyspark.ml.classification import LogisticRegression

    labeled = _featurize(
        positive.select(F.col(text_col)).withColumn("label", F.lit(1.0)).unionByName(
            negative.select(F.col(text_col)).withColumn("label", F.lit(0.0))
        ),
        text_col,
        num_features,
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return lr.fit(labeled)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append the positive-class probability for every document.
    model.transform is JVM-side map-only; no shuffle, no Python UDF."""
    num_features = model.numFeatures
    feats = _featurize(df, text_col, num_features)
    scored = model.transform(feats)
    from pyspark.ml.functions import vector_to_array

    return scored.withColumn(
        out_col, F.element_at(vector_to_array("probability"), 2)
    ).drop("__features", "rawPrediction", "probability", "prediction")


def quality_filter(
    df: DataFrame,
    model,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents the classifier scores as reference-like."""
    return (
        score_quality(df, model, text_col)
        .where(F.col("quality_prob") >= threshold)
    )
