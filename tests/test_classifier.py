"""Learned quality filter (operators/classifier.py): learning-dynamics
invariants plus a numpy replay of the exact GD recurrence."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from aircraftutilization_etl_spark.operators.classifier import (
    N_BUCKETS,
    hashed_features,
    predict,
    train_logreg_hashed,
)


def _corpus(spark, n_per_class=30, seed=4):
    rng = random.Random(seed)
    good_vocab = ["alpha", "beta", "gamma", "delta", "useful", "prose"]
    bad_vocab = ["zzz", "xxx", "yyy", "spam", "buy"]
    rows = []
    for i in range(n_per_class):
        rows.append((i, " ".join(rng.choice(good_vocab) for _ in range(12)), 1))
        rows.append(
            (1000 + i, " ".join(rng.choice(bad_vocab) for _ in range(12)), 0)
        )
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, label int"
    )
    return docs, labels, rows


class TestHashedFeatures:
    def test_l1_normalized_and_bucket_stable(self, spark):
        df = spark.createDataFrame(
            [(1, "cat cat dog")], "doc_id long, text string"
        )
        got = {r.bucket: r.x for r in hashed_features(df).collect()}
        cat = int(hashlib.md5(b"cat").hexdigest()[:8], 16) % N_BUCKETS
        dog = int(hashlib.md5(b"dog").hexdigest()[:8], 16) % N_BUCKETS
        assert got[cat] == pytest.approx(2 / 3)
        assert got[dog] == pytest.approx(1 / 3)
        assert sum(got.values()) == pytest.approx(1.0)


class TestTraining:
    def test_loss_decreases_and_separable_data_fits(self, spark):
        docs, labels, rows = _corpus(spark)
        feats = hashed_features(docs)
        w, b, losses = train_logreg_hashed(feats, labels, iterations=12)
        assert losses[0] == pytest.approx(math.log(2), abs=1e-6)
        assert all(a > c for a, c in zip(losses, losses[1:]))
        preds = {r.doc_id: r.prob for r in predict(feats, w, b).collect()}
        acc = sum((preds[i] >= 0.5) == (y == 1) for i, _, y in rows) / len(rows)
        assert acc == 1.0

    def test_matches_numpy_replay(self, spark):
        import numpy as np

        docs, labels, _ = _corpus(spark, n_per_class=15)
        feats = hashed_features(docs)
        w, b, losses = train_logreg_hashed(feats, labels, iterations=5)

        frows = feats.collect()
        lrows = {r.doc_id: r.label for r in labels.collect()}
        ids = sorted({r.doc_id for r in frows})
        idx = {d: i for i, d in enumerate(ids)}
        X = np.zeros((len(ids), N_BUCKETS))
        for r in frows:
            X[idx[r.doc_id], r.bucket] = r.x
        y = np.array([lrows[d] for d in ids], dtype=float)
        wn = np.zeros(N_BUCKETS)
        bn = 0.0
        lr, n = 2.0, len(ids)
        replay_losses = []
        for _ in range(5):
            p = 1 / (1 + np.exp(-(X @ wn + bn)))
            replay_losses.append(
                float(
                    -(
                        y * np.log(np.maximum(p, 1e-12))
                        + (1 - y) * np.log(np.maximum(1 - p, 1e-12))
                    ).mean()
                )
            )
            g = X.T @ (p - y)
            wn -= lr * g / n
            bn -= lr * (p - y).sum() / n
        assert losses == pytest.approx(replay_losses, rel=1e-9)
        assert b == pytest.approx(bn, rel=1e-9)
        assert np.abs(np.array(w) - wn).max() < 1e-9


class TestNaiveBayes:
    def test_separable_corpus_perfect_diagonal(self, spark):
        from aircraftutilization_etl_spark.operators.classifier import (
            naive_bayes_confusion,
        )

        # two classes with disjoint vocabularies; ids chosen so the md5
        # split leaves held-out docs in both classes
        rows = [
            (i, "alpha beta gamma", "en") for i in range(0, 40)
        ] + [
            (i, "uno dos tres", "es") for i in range(40, 80)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        conf = naive_bayes_confusion(df).collect()
        got = {(r.actual, r.predicted): r.n_docs for r in conf}
        assert all(a == p for (a, p) in got), got
        # every held-out doc lands on the diagonal
        assert sum(got.values()) > 0

    def test_prior_decides_for_unseen_words(self, spark):
        from aircraftutilization_etl_spark.operators.classifier import (
            naive_bayes_confusion,
        )

        # held-out docs consist ONLY of OOV tokens; with equal smoothed
        # likelihoods the majority-class prior must decide. Class sizes
        # must survive the md5 split, so weight 'big' heavily.
        rows = [(i, "common words here", "big") for i in range(0, 60)] + [
            (i, "common words here", "small") for i in range(60, 64)
        ] + [(i + 100, "zz qq vv", "small") for i in range(0, 6)]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        conf = naive_bayes_confusion(df).collect()
        preds = {r.actual: r.predicted for r in conf if r.actual == "small"}
        # the OOV held-out 'small' docs (if any survived the split) are
        # pulled to 'big' by the prior; 'big' held-out stays 'big'
        for r in conf:
            if r.actual == "big":
                assert r.predicted == "big"
