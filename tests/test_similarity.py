"""Similarity operator unit tests with hand-computed cosines."""

from __future__ import annotations

import math

from aircraftutilization_etl_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_topk,
)

EMB = "vec_id long, embedding array<float>, label int"


def _vecs(spark, rows):
    return spark.createDataFrame(rows, EMB)


def test_cosine_topk_hand_computed(spark):
    corpus = _vecs(
        spark,
        [
            (0, [1.0, 0.0], 0),   # query
            (1, [1.0, 0.0], 0),   # cosine 1.0
            (2, [1.0, 1.0], 0),   # cosine 1/sqrt(2)
            (3, [0.0, 1.0], 0),   # cosine 0.0
            (4, [-1.0, 0.0], 0),  # cosine -1.0
        ],
    )
    out = cosine_topk(corpus.filter("vec_id = 0"), corpus, k=3).collect()
    got = [(r["neighbor_id"], r["cosine"], r["rank"]) for r in out]
    assert got == [
        (1, 1.0, 1),
        (2, round(1 / math.sqrt(2), 6), 2),
        (3, 0.0, 3),
    ]


def test_cosine_topk_tie_breaks_on_neighbor_id(spark):
    corpus = _vecs(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (5, [2.0, 0.0], 0),  # cosine 1.0 (scale-invariant)
            (3, [3.0, 0.0], 0),  # cosine 1.0
        ],
    )
    out = cosine_topk(corpus.filter("vec_id = 0"), corpus, k=2).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(3, 1), (5, 2)]


def test_cosine_topk_excludes_self(spark):
    corpus = _vecs(spark, [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0)])
    out = cosine_topk(corpus.filter("vec_id = 0"), corpus, k=5).collect()
    assert [r["neighbor_id"] for r in out] == [1]


def test_cosine_pairs_threshold_and_order(spark):
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.1], 0),   # cos(1,2) ~ 0.995
            (3, [0.0, 1.0], 0),   # cos(1,3) = 0, cos(2,3) ~ 0.0995
        ],
    )
    out = cosine_pairs(corpus, threshold=0.9).collect()
    assert len(out) == 1
    p = out[0]
    assert (p["id_a"], p["id_b"]) == (1, 2)  # always id_a < id_b
    expected = 1.0 / math.sqrt(1 + 0.01)
    assert abs(p["cosine"] - expected) < 1e-6


def test_cosine_pairs_multi_block_matches_single_block(spark):
    """Tiny block_rows forces many block-pair tasks (diagonal + cross);
    the blocked self-join must emit exactly the single-block result."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], 0) for i in range(60)
    ]
    corpus = _vecs(spark, rows)

    def key(r):
        return (r["id_a"], r["id_b"], r["cosine"])

    one = sorted(map(key, cosine_pairs(corpus, 0.5, block_rows=100).collect()))
    many = sorted(map(key, cosine_pairs(corpus, 0.5, block_rows=7).collect()))
    assert len(one) > 5  # the threshold actually selects a real subset
    assert many == one


def test_ivf_searches_own_cell_only(spark):
    corpus = _vecs(
        spark,
        [
            (0, [1.0, 0.0], 7),
            (1, [1.0, 0.0], 7),   # same cell, cosine 1.0
            (2, [1.0, 0.0], 8),   # perfect match but other cell -> unseen
        ],
    )
    out = ivf_topk(corpus.filter("vec_id = 0"), corpus, k=5).collect()
    assert [r["neighbor_id"] for r in out] == [1]


class TestSrpLsh:
    def test_identical_vectors_always_collide(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(20)]
        rows.append((99, rows[0][1]))  # exact copy of vec 0
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        from aircraftutilization_etl_spark.operators.similarity import srp_topk

        got = srp_topk(df.filter("vec_id = 0"), df, k=3).collect()
        # an identical vector matches every band, scores cosine 1.0
        assert got[0]["neighbor_id"] == 99 and got[0]["cosine"] == 1.0

    def test_band_keys_partitioning_independent(self, spark):
        import random

        rng = random.Random(11)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(50)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        from aircraftutilization_etl_spark.operators.similarity import (
            with_srp_bands,
        )

        a = {
            (r["vec_id"], r["band"], r["band_key"])
            for r in with_srp_bands(df).select(
                "vec_id", "band", "band_key"
            ).collect()
        }
        b = {
            (r["vec_id"], r["band"], r["band_key"])
            for r in with_srp_bands(df.repartition(7)).select(
                "vec_id", "band", "band_key"
            ).collect()
        }
        assert a == b
        # 2 bands per vector, 4-bit keys
        assert all(len(k) == 4 for _, _, k in a)
        assert len(a) == 100


class TestQuantize:
    def test_codes_and_edge_cases(self, spark):
        from aircraftutilization_etl_spark.operators.similarity import (
            quantize_embeddings,
        )

        df = spark.createDataFrame(
            [
                (1, [1.0, -1.0, 0.5, 0.0]),
                (2, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0 -> codes 0
            ],
            "vec_id long, embedding array<double>",
        )
        got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
        assert got[1]["qvec"] == [127, -127, 63, 0]  # floor(0.5*127)=63
        assert got[1]["scale"] == 1.0
        assert got[2]["qvec"] == [0, 0, 0, 0]


def test_collect_matrix_enforces_broadcast_budget(spark):
    """The 'query set is small' contract is a raise, not an assumption."""
    import pytest

    from aircraftutilization_etl_spark.operators import similarity as sim

    df = spark.range(50).selectExpr(
        "id as vec_id", "array(cast(id as float)) as embedding"
    )
    orig = sim.MAX_BROADCAST_QUERIES
    sim.MAX_BROADCAST_QUERIES = 10
    try:
        with pytest.raises(ValueError, match="broadcast budget"):
            sim.cosine_topk(df, df, 3)
    finally:
        sim.MAX_BROADCAST_QUERIES = orig


class TestCosineBestMatch:
    def test_matches_numpy_argmax(self, spark):
        import numpy as np

        from aircraftutilization_etl_spark.operators.similarity import (
            cosine_best_match,
        )

        rng = np.random.default_rng(7)
        corpus = rng.normal(size=(40, 8))
        refs = rng.normal(size=(5, 8))
        cdf = spark.createDataFrame(
            [(i, [float(x) for x in corpus[i]]) for i in range(40)],
            "vec_id long, embedding array<float>",
        )
        rdf = spark.createDataFrame(
            [(100 + i, [float(x) for x in refs[i]]) for i in range(5)],
            "vec_id long, embedding array<float>",
        )
        got = {
            r.vec_id: (r.best_ref_id, r.cosine)
            for r in cosine_best_match(cdf, rdf).collect()
        }
        cn = corpus.astype(np.float32).astype(np.float64)
        rn = refs.astype(np.float32).astype(np.float64)
        cn /= np.linalg.norm(cn, axis=1, keepdims=True)
        rn /= np.linalg.norm(rn, axis=1, keepdims=True)
        sims = cn @ rn.T
        assert len(got) == 40
        for i in range(40):
            j = int(np.argmax(sims[i]))
            assert got[i][0] == 100 + j
            assert abs(got[i][1] - sims[i, j]) < 1e-5

    def test_partitioning_invariant(self, spark):
        from aircraftutilization_etl_spark.operators.similarity import (
            cosine_best_match,
        )

        cdf = spark.range(30).selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 8), x -> CAST(pmod(id * x, 11) AS FLOAT)) AS embedding",
        )
        rdf = spark.range(3).selectExpr(
            "id + 500 AS vec_id",
            "transform(sequence(1, 8), x -> CAST(pmod((id + 3) * x, 7) + 1 AS FLOAT)) AS embedding",
        )
        a = {tuple(r) for r in cosine_best_match(cdf, rdf).collect()}
        b = {tuple(r) for r in cosine_best_match(cdf.repartition(9), rdf).collect()}
        assert a == b


class TestRRFFuse:
    """Reciprocal-rank fusion: known hand-fused outcomes."""

    def _lists(self, spark, lex_rows, vec_rows):
        schema = "query_id long, doc_id long, rank int"
        return (
            spark.createDataFrame(lex_rows, schema),
            spark.createDataFrame(vec_rows, schema),
        )

    def test_doc_in_both_lists_outranks_single_list_docs(self, spark):
        from aircraftutilization_etl_spark.operators.similarity import rrf_fuse

        lex, vec = self._lists(
            spark,
            [(1, 10, 1), (1, 11, 2)],
            [(1, 10, 2), (1, 12, 1)],
        )
        out = {r.doc_id: r for r in rrf_fuse(lex, vec, 10).collect()}
        # doc 10: 1e9//61 + 1e9//62 beats doc 12's 1e9//61 and 11's 1e9//62
        assert out[10].rank == 1
        assert out[10].rrf_score_e9 == 10**9 // 61 + 10**9 // 62
        assert out[12].rank == 2  # single-list scores tie-break... no:
        # 12 has 1e9//61 = 16393442, 11 has 1e9//62 = 16129032 -> 12 second
        assert out[11].rank == 3
        assert out[12].lex_rank is None and out[12].vec_rank == 1

    def test_fused_k_cut_and_per_query_isolation(self, spark):
        from aircraftutilization_etl_spark.operators.similarity import rrf_fuse

        lex, vec = self._lists(
            spark,
            [(1, d, r + 1) for r, d in enumerate(range(10, 15))]
            + [(2, 20, 1)],
            [(1, d, r + 1) for r, d in enumerate(range(12, 17))],
        )
        out = rrf_fuse(lex, vec, 3)
        assert out.filter("query_id = 1").count() == 3
        assert out.filter("query_id = 2").count() == 1
