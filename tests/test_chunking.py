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
