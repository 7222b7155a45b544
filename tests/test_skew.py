"""operators/skew.chunked_self_pairs — the shared Zipf-head guard.

Output-invariance is the whole contract: the chunked join must produce
EXACTLY the plain self-join's multiset of (pair, shared-key) rows,
payload included, for hot keys far above the cap and for normal keys
(m=1 degenerate path) alike.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aircraftutilization_etl_spark.operators.skew import chunked_self_pairs


def _plain_pairs(keyed, key_cols, id_col, payload):
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        *key_cols,
        *[F.col(c).alias(n[0]) for c, n in payload.items()],
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        *key_cols,
        *[F.col(c).alias(n[1]) for c, n in payload.items()],
    )
    return (
        a.join(b, list(key_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *[n for ns in payload.values() for n in ns])
    )


def test_hot_key_output_identical_with_payload(spark):
    cap = 7  # tiny cap so even a 60-member bucket chunks into 9 groups
    rng = random.Random(17)
    rows = [
        (i, rng.choice(["hot"] * 8 + [f"cold{i % 11}"]), float(i % 5) + 0.5)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, k string, w double")
    payload = {"w": ("wa", "wb")}
    got = sorted(
        map(
            tuple,
            chunked_self_pairs(df, ["k"], "doc_id", cap, payload).collect(),
        )
    )
    want = sorted(
        map(tuple, _plain_pairs(df, ["k"], "doc_id", payload).collect())
    )
    assert got == want
    assert len(got) > 1000  # the hot key really is quadratic here


def test_multiset_semantics_per_shared_key(spark):
    # two rows per (id, key) never occur in our consumers, but multiple
    # shared KEYS per pair do: each shared key must yield exactly one row
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = chunked_self_pairs(df, ["k"], "doc_id", 64).groupBy(
        "id_a", "id_b"
    ).count()
    got = {(r.id_a, r.id_b): r["count"] for r in out.collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def _physical_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cold_corpus_skips_chunk_columns_and_pin(spark):
    """max f <= cap and tiny Σf²: the plain-key join with no explicit
    repartition — AQE stays free to broadcast/coalesce."""
    rows = [(i, f"k{i % 40}") for i in range(200)]  # every bucket f=5
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = chunked_self_pairs(df, ["k"], "doc_id", cap=64)
    plan = _physical_plan(out)
    assert "__ca" not in plan
    assert "REPARTITION_BY_NUM" not in plan and "RoundRobin" not in plan
    got = sorted((r.id_a, r.id_b) for r in out.collect())
    want = sorted(
        map(tuple, _plain_pairs(df, ["k"], "doc_id", {}).collect())
    )
    assert got == want


def test_hot_corpus_engages_chunks_without_pin_below_threshold(spark):
    """max f > cap but Σf² below PIN_TOTAL_PAIRS: chunk columns join,
    no pinned exchange."""
    rows = [(i, "hot") for i in range(100)]  # one bucket f=100 > cap
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = chunked_self_pairs(df, ["k"], "doc_id", cap=8)
    plan = _physical_plan(out)
    assert "__ca" in plan
    assert "REPARTITION_BY_NUM" not in plan
    assert len(out.collect()) == 100 * 99 // 2


def test_pin_threshold_forces_explicit_repartition(spark, monkeypatch):
    """Σf² above the threshold pins the join exchange. The pin shows in
    the sort-merge regime (the scale case — big-bytes sides); when the
    planner broadcast-converts instead, the sides were byte-small and
    pair volume is bounded by rows×cap, so the dropped pin is benign
    (see the operator docstring) — the test disables auto-broadcast to
    exercise the regime the pin exists for."""
    from aircraftutilization_etl_spark.operators import skew

    monkeypatch.setattr(skew, "PIN_TOTAL_PAIRS", 10)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rows = [(i, f"k{i % 4}") for i in range(40)]  # Σf² = 400 > 10
        df = spark.createDataFrame(rows, "doc_id long, k string")
        out = skew.chunked_self_pairs(df, ["k"], "doc_id", cap=64)
        plan = _physical_plan(out)
        assert "REPARTITION_BY_NUM" in plan
        got = sorted((r.id_a, r.id_b) for r in out.collect())
        want = sorted(
            map(tuple, _plain_pairs(df, ["k"], "doc_id", {}).collect())
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_empty_input_stays_lazyless_and_typed(spark):
    df = spark.createDataFrame([], "doc_id long, k string")
    out = chunked_self_pairs(df, ["k"], "doc_id", cap=8)
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b"]
    assert out.count() == 0


def test_self_pair_stats_values(spark):
    from aircraftutilization_etl_spark.operators.skew import self_pair_stats

    rows = [(i, "hot") for i in range(10)] + [(100 + i, f"c{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    mx, s2 = self_pair_stats(df, ["k"])
    assert (mx, s2) == (10, 100 + 4)  # 10² + 4·1²
    mx, s2 = self_pair_stats(
        spark.createDataFrame([], "doc_id long, k string"), ["k"]
    )
    assert (mx, s2) == (0, 0)


def test_cold_path_persists_nothing(spark):
    """ADVICE r10: the guard used to persist a window-counted frame on
    EVERY call and never unpersist it — repeated invocations
    accumulated cached frames. The stats-first form caches only in the
    hot branch (where both join sides genuinely consume the window),
    so a cold-corpus plan must contain no InMemoryRelation."""
    rows = [(i, f"k{i % 40}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = chunked_self_pairs(df, ["k"], "doc_id", cap=64)
    assert "InMemoryTableScan" not in _physical_plan(out)
    # the hot branch does cache (shared by both replicated sides)
    hot = spark.createDataFrame(
        [(i, "hot") for i in range(100)], "doc_id long, k string"
    )
    out_hot = chunked_self_pairs(hot, ["k"], "doc_id", cap=8)
    assert "InMemoryTableScan" in _physical_plan(out_hot)
    spark.catalog.clearCache()
