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

    Rows-only BY NECESSITY (the one remaining oracle=None entry):
    gradient sums commute only up to float addition order, and on this
    corpus the weak label is near-inseparable (mean_pred ≈ 0.5 ± 1e-4
    at every SF), so NO margin-based boolean certificate exists that
    partition-order noise could not flip — unlike the sketch queries,
    whose estimates are deterministic functions of the key set.
    Learning dynamics (loss decrease, separable-data accuracy, numpy
    replay within tolerance) are pinned by tests/test_classifier.py.

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


@query(
    "q_text_naive_bayes",
    """
    WITH tagged AS (
        SELECT doc_id, lang AS actual, text,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                   AS in_train
        FROM documents
    ),
    train_words AS (
        SELECT actual AS cls, lower(t.w) AS w
        FROM tagged,
             UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
        WHERE in_train
    ),
    model AS (SELECT cls, w, COUNT(*) AS c FROM train_words GROUP BY 1, 2),
    cls_tot AS (SELECT cls, COUNT(*) AS t FROM train_words GROUP BY 1),
    vocab AS (SELECT COUNT(DISTINCT w) AS v FROM train_words),
    priors AS (SELECT actual AS cls, COUNT(*) AS nd FROM tagged
               WHERE in_train GROUP BY 1),
    ntr AS (SELECT COUNT(*) AS n FROM tagged WHERE in_train),
    classes AS (
        SELECT p.cls,
               CAST(FLOOR(ln(p.nd * 1.0 / ntr.n) * 1000000) AS BIGINT)
                   AS prior_micros,
               ct.t + vocab.v AS denom
        FROM priors p CROSS JOIN ntr
          JOIN cls_tot ct ON ct.cls = p.cls
          CROSS JOIN vocab
    ),
    hw AS (
        SELECT doc_id, actual, lower(t.w) AS w
        FROM tagged,
             UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
        WHERE NOT in_train
    ),
    scored AS (
        -- PER-TERM floored micros, then an INTEGER (order-independent)
        -- sum: scores cannot drift with partitioning/accumulation
        -- order; the only residual cross-engine hazard is one term's
        -- ln landing within an ulp of a micro boundary (~1e-9/term)
        SELECT h.doc_id, h.actual, cl.cls,
               cl.prior_micros
                 + SUM(CAST(FLOOR(ln((COALESCE(m.c, 0) + 1.0) / cl.denom)
                                  * 1000000) AS BIGINT)) AS score
        FROM hw h CROSS JOIN classes cl
          LEFT JOIN model m ON m.cls = cl.cls AND m.w = h.w
        GROUP BY h.doc_id, h.actual, cl.cls, cl.prior_micros
    ),
    pred AS (
        SELECT doc_id, actual, cls AS predicted
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY score DESC, cls) AS r
              FROM scored)
        WHERE r = 1
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_text_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained ON the
    engine (add-1 smoothing, document-count priors) over the 80% md5
    train split, evaluated as a confusion matrix on the held-out 20% —
    the supervised-classification primitive whose closed-form training
    (counting) lets the SQL oracle replay train AND predict exactly,
    which the gradient-descent classifier (q_quality_classifier,
    rows-only) cannot.

    Scale (operators/classifier.naive_bayes_confusion): two map-side-
    combined count aggregates train the model; scoring is held-out
    tokens × |classes| against the (class, word) model join; the
    argmax is a |classes|-row per-doc window. All JVM, no Python —
    even training stays inside codegen.
    """
    from ..operators.classifier import naive_bayes_confusion

    d = table(spark, sf_dir, "documents")
    return naive_bayes_confusion(d)
