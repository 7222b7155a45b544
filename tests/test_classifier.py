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
        rows = hashed_features(df).collect()
        got = {r.bucket: r.x for r in rows}
        cat = int(hashlib.md5(b"cat").hexdigest()[:8], 16) % N_BUCKETS
        dog = int(hashlib.md5(b"dog").hexdigest()[:8], 16) % N_BUCKETS
        assert got[cat] == pytest.approx(2 / 3)
        assert got[dog] == pytest.approx(1 / 3)
        assert sum(got.values()) == pytest.approx(1.0)
        # exact integer counts the integerized trainer consumes
        counts = {r.bucket: (r.c, r.t) for r in rows}
        assert counts[cat] == (2, 3)
        assert counts[dog] == (1, 3)


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

    def test_matches_exact_integer_replay(self, spark):
        """The integerized recurrence is partition-order-exact, so a
        scalar Python replay must reproduce weights, bias and floored
        losses EXACTLY — the local twin of the DuckDB oracle that
        replays all rounds for q_quality_classifier."""
        docs, labels, _ = _corpus(spark, n_per_class=15)
        feats = hashed_features(docs)
        iters, lr = 5, 2.0
        w, b, losses = train_logreg_hashed(
            feats, labels, iterations=iters, lr=lr
        )

        frows = feats.collect()
        lrows = {r.doc_id: r.label for r in labels.collect()}
        per_doc = {}  # doc_id -> (t, [(bucket, c), ...])
        for r in frows:
            per_doc.setdefault(r.doc_id, (r.t, []))[1].append(
                (r.bucket, r.c)
            )
        n = len(per_doc)
        wn = [0] * N_BUCKETS
        bn = 0
        replay_losses = []
        for _ in range(iters):
            grads = [0] * N_BUCKETS
            rsum = 0
            lsum = 0
            for doc_id, (t, buckets) in per_doc.items():
                num = sum(wn[bk] * c for bk, c in buckets) + bn * t
                m = float(num) / (t * 1000000.0)
                p = 1.0 / (1.0 + math.exp(-m))
                pm = math.floor(p * 1000000.0)
                r = pm - lrows[doc_id] * 1000000
                rsum += r
                y = float(lrows[doc_id])
                loss = -(
                    y * math.log(max(p, 1e-12))
                    + (1 - y) * math.log(max(1 - p, 1e-12))
                )
                lsum += math.floor(loss * 1000000.0)
                for bk, c in buckets:
                    grads[bk] += math.floor((c * r * 1000.0) / t)
            replay_losses.append(lsum / 1000000 / n)
            for bk in range(N_BUCKETS):
                if grads[bk]:
                    wn[bk] -= math.floor((lr * grads[bk]) / (1000.0 * n))
            bn -= math.floor((lr * rsum) / float(n))
        assert losses == replay_losses
        assert b == bn
        assert w == wn

    def test_exactness_bound_violation_raises_loudly(self, spark):
        """ADVICE r6: the bit-stable-margin claim requires every BIGINT
        the round SQL casts to DOUBLE to stay under 2^53 — the per-row
        gradient term is bounded by t·1e9, so a doc with t ≥ 2^53/1e9
        (~9.01e6 feature tokens) must fail LOUDLY at train time, not
        surface as a flaky oracle hash."""
        feats = spark.createDataFrame(
            [(1, 7, 10_000_000, 10_000_000, 1.0)],
            "doc_id long, bucket long, c long, t long, x double",
        )
        labels = spark.createDataFrame([(1, 1)], "doc_id long, label int")
        with pytest.raises(ArithmeticError, match="2\\^53"):
            train_logreg_hashed(feats, labels, iterations=1)

    def test_predict_enforces_bound_on_scoring_corpus(self, spark):
        """ADVICE r7: a trained model's bound was checked against the
        TRAINING corpus; scoring a corpus with larger per-doc token
        totals must fail loudly too, executor-side, not silently lose
        margin bit-stability."""
        from aircraftutilization_etl_spark.operators.classifier import (
            predict,
        )

        feats = spark.createDataFrame(
            [(1, 7, 10_000_000, 10_000_000, 1.0)],
            "doc_id long, bucket long, c long, t long, x double",
        )
        w = [0] * 4096
        w[7] = 2_000_000_000  # 2e9 micros -> t threshold ~4.5e6
        with pytest.raises(Exception, match="2\\^53"):
            predict(feats, w, 100).collect()
        # the same corpus with a small model is INSIDE the scoring
        # bound (t*wb ~6e9 << 2^53; scoring uses the 1e6 denominator
        # floor, not training's conservative 1e9 gradient floor —
        # code-review r8) and must score normally
        w[7] = 500
        assert predict(feats, w, 100).count() == 1

    def test_concurrent_trainers_do_not_clobber_each_other(self, spark):
        """Two trainers sharing one SparkSession draw distinct temp-view
        suffixes, so parallel training runs return exactly the models
        their inputs dictate (pins the itertools.count draw — an
        unguarded counter let both threads observe one value and read
        each other's weights views)."""
        import threading

        docs_a, labels_a, _ = _corpus(spark, n_per_class=8, seed=4)
        docs_b, labels_b, _ = _corpus(spark, n_per_class=8, seed=9)
        feats_a, feats_b = hashed_features(docs_a), hashed_features(docs_b)
        expect_a = train_logreg_hashed(feats_a, labels_a, iterations=3)
        expect_b = train_logreg_hashed(feats_b, labels_b, iterations=3)
        assert expect_a != expect_b  # distinct corpora → distinct models
        got = {}

        def run(key, feats, labels):
            got[key] = train_logreg_hashed(feats, labels, iterations=3)

        ts = [
            threading.Thread(target=run, args=("a", feats_a, labels_a)),
            threading.Thread(target=run, args=("b", feats_b, labels_b)),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert got["a"] == expect_a
        assert got["b"] == expect_b


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
