"""Stream-stream attribution join: batch equivalence on a file replay.

Pattern notes (pinned by earlier rounds): availableNow can coalesce all
files into one micro-batch, freezing the watermark at epoch and emitting
nothing — so the replay uses maxFilesPerTrigger=1 with a processingTime
trigger and polls the sink; a far-future sentinel on BOTH sides pushes
the final watermark past every real event so append mode flushes all
pairs.
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pandas as pd
import pytest

from aircraftutilization_etl_spark.streaming.events_stream import (
    click_purchase_attribution,
)

T0 = datetime(2024, 4, 5, 12, 0, 0)


def _events(rng_rows):
    return pd.DataFrame(
        rng_rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )


def _make_batches():
    rows = []
    eid = 0
    for u in range(6):
        for k in range(5):
            rows.append(
                (eid, T0 + timedelta(minutes=3 * k + u), u, "click", 0.0)
            )
            eid += 1
            if k % 2 == 0:
                rows.append(
                    (
                        eid,
                        T0 + timedelta(minutes=3 * k + u + 10),
                        u,
                        "purchase",
                        10.0 + eid,
                    )
                )
                eid += 1
    # sentinels: distinct users, far future — push the watermark, match nothing
    future = T0 + timedelta(hours=6)
    rows.append((90001, future, -1, "click", 0.0))
    rows.append((90002, future, -2, "purchase", 0.0))
    return [rows[: len(rows) // 2], rows[len(rows) // 2 :]]


@pytest.mark.slow
def test_stream_matches_batch(spark, tmp_path):
    batches = _make_batches()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, b in enumerate(batches):
        # µs timestamps: the session reads TIMESTAMP(NANOS) as long
        # (nanosAsLong), which would clash with the stream's schema
        _events(b).to_parquet(
            in_dir / f"b{i}.parquet",
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )

    # batch expectation: same function, static frames (watermarks no-op)
    static = spark.read.schema(schema).parquet(str(in_dir))
    expect = {
        tuple(r)
        for r in click_purchase_attribution(
            static.filter("event_type = 'click'"),
            static.filter("event_type = 'purchase'"),
        ).collect()
    }
    assert expect  # scenario actually produces pairs

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out = tmp_path / "out"
    q = (
        click_purchase_attribution(
            stream.filter("event_type = 'click'"),
            stream.filter("event_type = 'purchase'"),
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        got = set()
        while time.time() < deadline:
            try:
                got = {
                    tuple(r) for r in spark.read.parquet(str(out)).collect()
                }
            except Exception:
                got = set()
            if got == expect:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert got == expect

@pytest.mark.slow
def test_outer_stream_matches_batch(spark, tmp_path):
    from aircraftutilization_etl_spark.streaming.events_stream import (
        purchase_attribution_outer,
    )

    batches = _make_batches()
    # add purchases with NO click in horizon (fresh users) — the rows
    # only the outer join keeps
    organic = [
        (80001, T0 + timedelta(minutes=7), 100, "purchase", 500.0),
        (80002, T0 + timedelta(minutes=40), 101, "purchase", 600.0),
    ]
    batches[0] = batches[0] + organic

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, b in enumerate(batches):
        _events(b).to_parquet(
            in_dir / f"b{i}.parquet",
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    static = spark.read.schema(schema).parquet(str(in_dir))
    # sentinels (negative users) exist only to push the watermark; the
    # stream correctly never emits the sentinel purchase itself (the
    # watermark cannot pass the maximum event time), so equivalence is
    # asserted over the real users
    expect = {
        tuple(r)
        for r in purchase_attribution_outer(
            static.filter("event_type = 'click'"),
            static.filter("event_type = 'purchase'"),
        ).collect()
        if r["user_id"] >= 0
    }
    # the scenario exercises both arms
    assert any(r[4] is None for r in expect)  # organic purchases
    assert any(r[4] is not None for r in expect)  # attributed pairs

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out = tmp_path / "out"
    q = (
        purchase_attribution_outer(
            stream.filter("event_type = 'click'"),
            stream.filter("event_type = 'purchase'"),
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = set()
        while time.time() < deadline:
            try:
                got = {
                    tuple(r)
                    for r in spark.read.parquet(str(out)).collect()
                    if r["user_id"] >= 0
                }
            except Exception:
                got = set()
            if got == expect:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert got == expect
