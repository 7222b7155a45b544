"""Streaming domain-cap admission control (VERDICT r10 #7): the
streaming member of the URL/domain curation family.

Equivalence contract: for ANY split of a per-domain (ts, id)-ordered
document log into micro-batches, the streamed admitted set — ids,
ranks, and all — equals the batch twin's rn <= cap selection. Proven
on a seeded random log with a Zipf-headed domain mix (one domain far
over cap, one exactly at cap, one under) across random split points,
plus in-stream URL -> domain derivation (the canonicalization layer is
pure projections, so it composes onto readStream unchanged).
"""

import datetime as dt
import random
import time

from pyspark.sql import functions as F

from aircraftutilization_etl_spark.streaming.curation_stream import (
    domain_admission_batch,
    domain_admission_stream,
)

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)
CAP = 5
SCHEMA = "doc_id long, domain string, ts timestamp"


def _log():
    """Seeded document log: hot.example far over cap, exact.example
    exactly at cap, cold.example under cap; ts strictly increasing so
    (ts, id) order == list order."""
    rng = random.Random(411)
    domains = (
        ["hot.example"] * 23 + ["exact.example"] * CAP + ["cold.example"] * 2
    )
    rng.shuffle(domains)
    return [
        (i, d, BASE + dt.timedelta(seconds=10 * i))
        for i, d in enumerate(domains)
    ]


def _run_stream(spark, tmp_path, chunks, src_schema=SCHEMA, derive=None):
    in_dir = tmp_path / "in"
    in_dir.mkdir(parents=True)
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, src_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(in_dir / f"b{i}.parquet"))
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/b*.parquet")
    )
    if derive is not None:
        stream = derive(stream)
    out_dir = str(tmp_path / "out")
    q = (
        domain_admission_stream(stream, CAP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return sorted(
        (r.domain, r.doc_id, r.admitted_rank)
        for r in spark.read.parquet(out_dir).collect()
    )


def _batch_expected(spark, rows, schema=SCHEMA):
    df = spark.createDataFrame(rows, schema)
    return sorted(
        (r.domain, r.doc_id, r.admitted_rank)
        for r in domain_admission_batch(df, CAP).collect()
    )


def test_stream_matches_batch_across_random_splits(spark, tmp_path):
    rows = _log()
    expected = _batch_expected(spark, rows)
    # the hot domain must actually be capped for the test to bite
    assert len(expected) < len(rows)
    assert sum(1 for d, _, _ in expected if d == "hot.example") == CAP
    assert sum(1 for d, _, _ in expected if d == "exact.example") == CAP
    assert sum(1 for d, _, _ in expected if d == "cold.example") == 2

    rng = random.Random(7)
    for trial in range(3):
        k = rng.randint(2, 6)
        cuts = sorted(rng.sample(range(1, len(rows)), k - 1))
        chunks = [
            rows[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])
        ]
        got = _run_stream(spark, tmp_path / f"t{trial}", chunks)
        assert got == expected, f"split {cuts}"


def test_cap_binds_within_single_batch(spark, tmp_path):
    """All rows in one micro-batch: the in-batch (ts, id) sort + head
    must admit exactly the batch twin's selection."""
    rows = _log()
    got = _run_stream(spark, tmp_path, [rows])
    assert got == _batch_expected(spark, rows)


def test_spent_domain_drops_later_batches(spark, tmp_path):
    """A domain that exhausts its cap in batch 1 admits nothing from
    batch 2 — the carried count, not the watermark, is the gate."""
    rows1 = [
        (i, "hot.example", BASE + dt.timedelta(seconds=i)) for i in range(CAP)
    ]
    rows2 = [
        (100 + i, "hot.example", BASE + dt.timedelta(seconds=100 + i))
        for i in range(4)
    ]
    got = _run_stream(spark, tmp_path, [rows1, rows2])
    assert [r[1] for r in got] == list(range(CAP))
    assert [r[2] for r in got] == list(range(1, CAP + 1))


def test_in_stream_url_derivation_composes(spark, tmp_path):
    """readStream -> with_canonical_columns -> admission: the layered
    canonicalization projections are stream-safe (no shuffle, no state)
    and the derived registrable domain keys the admission state."""
    from aircraftutilization_etl_spark.operators.url import (
        with_canonical_columns,
    )

    src_schema = "doc_id long, url string, ts timestamp"
    rows = [
        (
            i,
            f"HTTP://WWW.Hot.Example:80/p{i % 3}/?utm_source=x&x={i}#frag",
            BASE + dt.timedelta(seconds=10 * i),
        )
        for i in range(8)
    ] + [
        (
            100 + i,
            f"https://cold.example.co.uk/page-{i}",
            BASE + dt.timedelta(seconds=1000 + i),
        )
        for i in range(2)
    ]

    def derive(stream):
        return with_canonical_columns(stream).select("doc_id", "domain", "ts")

    got = _run_stream(
        spark, tmp_path, [rows[:4], rows[4:]], src_schema=src_schema,
        derive=derive,
    )
    # hot.example capped at 5 of its 8; the multi-label suffix domain
    # (example.co.uk) keeps both
    assert sum(1 for d, _, _ in got if d == "hot.example") == CAP
    assert sum(1 for d, _, _ in got if d == "example.co.uk") == 2
    batch = spark.createDataFrame(rows, src_schema)
    expected = sorted(
        (r.domain, r.doc_id, r.admitted_rank)
        for r in domain_admission_batch(
            with_canonical_columns(batch).select("doc_id", "domain", "ts"),
            CAP,
        ).collect()
    )
    assert got == expected


def test_batch_twin_uses_window_group_limit(spark):
    """The rn <= cap filter must lower to the map-side WindowGroupLimit
    (top-k heap per task), the q_domain_caps plan shape."""
    df = spark.createDataFrame(_log(), SCHEMA)
    plan = (
        domain_admission_batch(df, CAP)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_invalid_cap_raises(spark):
    import pytest

    df = spark.createDataFrame(_log(), SCHEMA)
    with pytest.raises(ValueError, match="cap"):
        domain_admission_batch(df, 0)
    with pytest.raises(ValueError, match="cap"):
        domain_admission_stream(df, 0)


def test_random_caps_and_logs_match_batch(spark, tmp_path):
    """Fuzz leg: random cap, random domain mix with duplicate
    timestamps (the doc_id tiebreak must agree), random split — the
    streamed admitted set must equal the batch twin every time."""
    from aircraftutilization_etl_spark.streaming import curation_stream as cs

    rng = random.Random(0xF00D)
    for trial in range(2):
        cap = rng.randint(1, 4)
        doms = [f"d{i}" for i in range(rng.randint(2, 5))]
        rows = []
        for i in range(rng.randint(10, 40)):
            # quantized ts -> deliberate ties within a domain
            ts = BASE + dt.timedelta(minutes=rng.randint(0, 5))
            rows.append((i, rng.choice(doms), ts))
        # the stream folds per-batch in (ts, id) order, so equivalence
        # needs the log split at (ts, id)-ordered boundaries
        rows.sort(key=lambda r: (r[2], r[0]))
        cut = rng.randint(1, len(rows) - 1)
        chunks = [rows[:cut], rows[cut:]]

        in_dir = tmp_path / f"fz{trial}" / "in"
        in_dir.mkdir(parents=True)
        for i, chunk in enumerate(chunks):
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(in_dir / f"b{i}.parquet"))
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir) + "/b*.parquet")
        )
        out_dir = str(tmp_path / f"fz{trial}" / "out")
        q = (
            cs.domain_admission_stream(stream, cap)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / f"fz{trial}" / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
        got = sorted(
            (r.domain, r.doc_id, r.admitted_rank)
            for r in spark.read.parquet(out_dir).collect()
        )
        df = spark.createDataFrame(rows, SCHEMA)
        want = sorted(
            (r.domain, r.doc_id, r.admitted_rank)
            for r in cs.domain_admission_batch(df, cap).collect()
        )
        assert got == want, f"trial {trial} cap {cap}"
        assert got
