"""Learned quality-filter queries (operators/classifier.py).

Rows-only driver check: gradient sums commute only up to float addition
order, so no cross-engine value oracle exists; learning dynamics and a
numpy replay are pinned by tests/test_classifier.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query, table

CLF_ITERATIONS = 6
LOW_SOURCES = tuple(f"src{i}" for i in range(10))


@query("q_quality_classifier", None)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a fastText-style hashed-unigram logistic regression ON the
    engine (6 full-batch GD rounds) against a weak source-group label,
    then report per-source calibration: docs, labeled share, and the
    model's mean predicted probability — the learned-filter workflow
    (CCNet/LLaMA-style quality models) as one Spark job chain.

    Scale: the model (2^12 weights) broadcasts as a literal; each round
    is one scoring pass + one feature-keyed gradient aggregation with
    map-side combine (≤ 4096 result rows) — data never moves to the
    driver, gradients do.
    """
    from ..operators.classifier import (
        hashed_features,
        predict,
        train_logreg_hashed,
    )

    d = table(spark, sf_dir, "documents")
    labels = d.select(
        "doc_id",
        F.col("source"),
        F.col("source").isin(list(LOW_SOURCES)).cast("int").alias("label"),
    )
    feats = hashed_features(d)
    w, b, _losses = train_logreg_hashed(
        feats, labels, iterations=CLF_ITERATIONS
    )
    preds = predict(feats, w, b)
    return (
        labels.join(preds, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("label").cast("int").alias("label"),
            F.round(F.avg("prob"), 4).alias("mean_pred"),
        )
        .orderBy("source")
    )
