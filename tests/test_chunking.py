"""Content-defined chunking: span tiling, bounds, re-alignment."""

from __future__ import annotations

import random

import pytest

from aircraftutilization_etl_spark.operators.chunking import (
    MAX_CHUNK,
    MIN_CHUNK,
    chunk_documents,
    chunk_spans,
)


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefgh ") for _ in range(n))


@pytest.mark.parametrize("method", ["md5", "gear"])
def test_spans_tile_document_exactly(method):
    rng = random.Random(3)
    for _ in range(20):
        text = _rand_text(rng, rng.randint(1, 400))
        spans = chunk_spans(text, method)
        assert spans[0][0] == 1
        assert spans[-1][1] == len(text)
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 == e1 + 1
        # every chunk obeys min/max except the final remainder
        for s, e in spans[:-1]:
            assert MIN_CHUNK <= e - s + 1 <= MAX_CHUNK
        assert spans[-1][1] - spans[-1][0] + 1 <= MAX_CHUNK


@pytest.mark.parametrize("method", ["md5"])
def test_boundaries_realign_after_prefix_insertion(method):
    # the CDC property fixed-size chunking lacks: after an insertion,
    # later chunk fingerprints re-synchronize
    rng = random.Random(9)
    base = _rand_text(rng, 600)
    shifted = "XYZ " + base
    def content(spans, text):
        return {text[s - 1 : e] for s, e in spans}
    a = content(chunk_spans(base), base)
    b = content(chunk_spans(shifted), shifted)
    # a majority of chunk contents survive the shift verbatim
    assert len(a & b) >= len(a) // 2


def test_chunk_near_dup_matches_scalar_jaccard(spark):
    # shared-paragraph pair should pair up via chunk-set Jaccard even
    # though the shared content sits at different offsets
    rng = random.Random(11)
    shared = _rand_text(rng, 400)
    rows = [
        (0, shared + _rand_text(rng, 60)),
        (1, _rand_text(rng, 60) + shared),
        (2, _rand_text(rng, 400)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from aircraftutilization_etl_spark.plans.chunking import (
        CHUNK_JACCARD_THRESH_PPM,
    )
    from aircraftutilization_etl_spark.operators.chunking import chunk_documents

    chunks = chunk_documents(df).collect()
    sets = {}
    for r in chunks:
        sets.setdefault(r["doc_id"], set()).add(r["chunk_md5"])
    expected = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            ppm = inter * 1_000_000 // (len(sets[a]) + len(sets[b]) - inter)
            if ppm >= CHUNK_JACCARD_THRESH_PPM:
                expected.append((a, b, inter, ppm))
    # re-run the pair logic off the same chunk table via SQL-equivalent ops
    from pyspark.sql import functions as F

    csets = chunk_documents(df).select("doc_id", "chunk_md5").distinct()
    sizes = csets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = csets.select(F.col("doc_id").alias("id_a"), "chunk_md5")
    b = csets.select(F.col("doc_id").alias("id_b"), "chunk_md5")
    got = (
        a.join(b, "chunk_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.expr("CAST(n_common * 1000000 DIV (n_a + n_b - n_common) AS BIGINT)").alias("ppm"),
        )
        .filter(F.col("ppm") >= CHUNK_JACCARD_THRESH_PPM)
        .collect()
    )
    got_tuples = sorted((r["id_a"], r["id_b"], r["n_common"], r["ppm"]) for r in got)
    assert got_tuples == sorted(expected)
    assert any(t[0] == 0 and t[1] == 1 for t in got_tuples)


def test_dataframe_kernel_matches_scalar(spark):
    rng = random.Random(5)
    rows = [(i, _rand_text(rng, rng.randint(1, 300))) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = chunk_documents(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        expected = chunk_spans(text)
        actual = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert [(r["start"], r["start"] + r["length"] - 1) for r in actual] == expected
