"""Watermarked windowed-aggregation streaming tests."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
from pyspark.sql import functions as F

from aircraftutilization_etl_spark.streaming.events_stream import (
    dedup_stream,
    run_hourly_rollup,
)

BASE = dt.datetime(2024, 4, 5, 10, 0, 0)


def _write_batch(path, rows, order, with_user=False):
    cols = ["event_id", "ts", "event_type", "value"] + (
        ["user_id"] if with_user else []
    )
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark rejects ns parquet
    pdf.to_parquet(path)
    os.utime(path, (1_700_000_000 + order, 1_700_000_000 + order))


def test_hourly_rollup_with_late_and_dropped_events(spark, tmp_path):
    in_dir = tmp_path / "events_in"
    in_dir.mkdir()
    h = dt.timedelta(hours=1)
    # batch 0: events in hour 10 and 11
    _write_batch(
        in_dir / "b0.parquet",
        order=0,
        rows=[
            (1, BASE + dt.timedelta(minutes=5), "click", 1.0),
            (2, BASE + dt.timedelta(minutes=40), "click", 2.0),
            (3, BASE + h, "view", 5.0),
        ],
    )
    # batches 1-2 advance the watermark far past hour 11 (the wm a batch
    # filters with can lag one batch behind the reported value); batch 3
    # then sends a too-late hour-10 event that must be dropped; batch 4
    # just advances time again.
    _write_batch(
        in_dir / "b1.parquet",
        order=1,
        rows=[(4, BASE + dt.timedelta(hours=5), "click", 1.0)],
    )
    _write_batch(
        in_dir / "b2.parquet",
        order=2,
        rows=[(5, BASE + dt.timedelta(hours=6), "click", 1.0)],
    )
    _write_batch(
        in_dir / "b3.parquet",
        order=3,
        rows=[(6, BASE + dt.timedelta(minutes=50), "click", 100.0)],  # too late
    )
    _write_batch(
        in_dir / "b4.parquet",
        order=4,
        rows=[(7, BASE + dt.timedelta(hours=7), "click", 1.0)],
    )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    q = run_hourly_rollup(
        stream,
        out_path=str(tmp_path / "rollup"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        watermark="2 hours",
        processing_time="1 second",  # per-batch watermark progression
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            progress = q.lastProgress
            if progress and progress["batchId"] >= 5 and progress[
                "numInputRows"
            ] == 0:
                break
            time.sleep(2)
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "rollup"))
    rows = [tuple(r) for r in out.collect()]
    # hour-10 click window finalized exactly once, WITHOUT the too-late
    # event 6 (no second emission for the same window either)
    hour10_clicks = [r for r in rows if r[0] == BASE and r[1] == "click"]
    assert hour10_clicks == [(BASE, "click", 2, 3.0)]
    assert (BASE + h, "view", 1, 5.0) in rows
    # hour-17 window not emitted: watermark has not passed its end
    assert not any(r[0] == BASE + dt.timedelta(hours=7) for r in rows)


def test_dedup_stream_drops_replayed_events(spark, tmp_path):
    in_dir = tmp_path / "dups_in"
    in_dir.mkdir()
    # batch 0: events 1,2 ; batch 1: replay of event 1 (same id) + new 3
    _write_batch(
        in_dir / "d0.parquet",
        order=0,
        rows=[
            (1, BASE, "click", 1.0),
            (2, BASE + dt.timedelta(minutes=1), "view", 2.0),
        ],
    )
    _write_batch(
        in_dir / "d1.parquet",
        order=1,
        rows=[
            (1, BASE, "click", 1.0),  # duplicate within watermark
            (3, BASE + dt.timedelta(minutes=2), "click", 3.0),
        ],
    )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3]  # event 1 emitted exactly once


def test_session_rollup_finalizes_and_merges(spark, tmp_path):
    """Streaming session_window: events 10 min apart merge into one
    session, a 40-min gap opens a new one, a within-watermark late
    event extends its (still-open) session, and sessions finalize once
    the watermark passes — matching the batch formulation's semantics."""
    from aircraftutilization_etl_spark.streaming.events_stream import (
        run_session_rollup,
    )

    in_dir = tmp_path / "sess_in"
    in_dir.mkdir()
    m = dt.timedelta(minutes=1)
    # batch 0: user 1 — one session of two events (10 min apart), then a
    # 40-min gap opens a second session
    _write_batch(
        in_dir / "b0.parquet",
        order=0,
        rows=[
            (1, BASE, "click", 1.0, 1),
            (2, BASE + 10 * m, "click", 2.0, 1),
            (3, BASE + 50 * m, "view", 4.0, 1),
        ],
        with_user=True,
    )
    # batch 1: late-but-within-watermark event lands in session 1
    # (watermark is far behind: max event time is BASE+50m)
    _write_batch(
        in_dir / "b1.parquet",
        order=1,
        rows=[(4, BASE + 15 * m, "click", 8.0, 1)],
        with_user=True,
    )
    # batches 2-3: user 2 far in the future — advances the watermark
    # past everything of user 1, finalizing both sessions
    _write_batch(
        in_dir / "b2.parquet",
        order=2,
        rows=[(5, BASE + dt.timedelta(hours=6), "click", 1.0, 2)],
        with_user=True,
    )
    _write_batch(
        in_dir / "b3.parquet",
        order=3,
        rows=[(6, BASE + dt.timedelta(hours=7), "click", 1.0, 2)],
        with_user=True,
    )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double,"
            " user_id long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    q = run_session_rollup(
        stream,
        out_path=str(tmp_path / "sessions"),
        checkpoint_dir=str(tmp_path / "sess_ckpt"),
        gap="30 minutes",
        watermark="2 hours",
        processing_time="1 second",
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            progress = q.lastProgress
            if progress and progress["batchId"] >= 4 and progress[
                "numInputRows"
            ] == 0:
                break
            time.sleep(2)
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "sessions"))
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in out.collect()
    }
    gap = dt.timedelta(minutes=30)
    # session 1: events at +0, +10, +15 (late) -> window [0, 15+30)
    assert got[(1, BASE, BASE + 15 * m + gap)] == (3, 11.0)
    # session 2: single event at +50 -> [50, 80)
    assert got[(1, BASE + 50 * m, BASE + 50 * m + gap)] == (1, 4.0)
    # user 2's sessions not finalized (watermark hasn't passed them)
    assert not any(u == 2 for (u, _s, _e) in got)


def test_stream_static_enrichment_sees_dimension_refresh(spark, tmp_path):
    """A parquet static side pins its file listing at query START: the
    refresh workflow is refresh-then-restart (availableNow runs restart
    by construction). Rows processed by the run after the refresh get
    the new attributes; earlier output keeps what was current then."""
    from aircraftutilization_etl_spark.streaming.events_stream import (
        enrich_with_dimension,
    )

    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "bronze")], "user_id long, tier string"
    ).write.mode("overwrite").parquet(dim_path)

    in_dir = tmp_path / "enrich_in"
    in_dir.mkdir()
    _write_batch(
        in_dir / "b0.parquet",
        order=0,
        rows=[(1, BASE, "click", 1.0, 1)],
        with_user=True,
    )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double,"
            " user_id long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    enriched = enrich_with_dimension(
        stream, spark.read.parquet(dim_path), on="user_id"
    )
    out_path = str(tmp_path / "enriched")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    # refresh the dimension, then a second event arrives
    spark.createDataFrame(
        [(1, "gold")], "user_id long, tier string"
    ).write.mode("overwrite").parquet(dim_path)
    _write_batch(
        in_dir / "b1.parquet",
        order=1,
        rows=[(2, BASE + dt.timedelta(minutes=1), "click", 2.0, 1)],
        with_user=True,
    )
    # re-resolve the dimension for the new run (parquet listings pin
    # at query start; an in-place overwrite invalidates the old one)
    enriched2 = enrich_with_dimension(
        stream, spark.read.parquet(dim_path), on="user_id"
    )
    q2 = (
        enriched2.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)

    rows = {
        r["event_id"]: r["tier"]
        for r in spark.read.parquet(out_path).collect()
    }
    assert rows == {1: "bronze", 2: "gold"}


def test_stream_static_rejects_right_join(spark, tmp_path):
    import pytest

    from aircraftutilization_etl_spark.streaming.events_stream import (
        enrich_with_dimension,
    )

    dim = spark.createDataFrame([(1, "x")], "user_id long, tier string")
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(tmp_path))
    )
    with pytest.raises(ValueError, match="inner/left"):
        enrich_with_dimension(stream, dim, on="user_id", how="right")


def test_hopping_stream_matches_batch_windows(spark, tmp_path):
    """Finalized sliding windows from the stream equal the batch
    window(ts, '1 hour', '15 minutes') aggregation over the same
    on-time rows."""
    from aircraftutilization_etl_spark.streaming.events_stream import (
        hopping_event_counts,
    )

    in_dir = tmp_path / "hop_in"
    in_dir.mkdir()
    rows = [
        (1, BASE + dt.timedelta(minutes=5), "click", 1.0),
        (2, BASE + dt.timedelta(minutes=20), "click", 2.5),
        (3, BASE + dt.timedelta(minutes=70), "view", 4.0),
    ]
    _write_batch(in_dir / "h0.parquet", order=0, rows=rows)
    # push the watermark far past every window end
    _write_batch(
        in_dir / "h1.parquet",
        order=1,
        rows=[(9, BASE + dt.timedelta(hours=9), "click", 0.0)],
    )
    _write_batch(
        in_dir / "h2.parquet",
        order=2,
        rows=[(10, BASE + dt.timedelta(hours=10), "click", 0.0)],
    )

    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    out_path = tmp_path / "hop_out"
    q = (
        hopping_event_counts(stream, watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", str(out_path))
        .option("checkpointLocation", str(tmp_path / "hop_ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            progress = q.lastProgress
            if progress and progress["batchId"] >= 3 and progress[
                "numInputRows"
            ] == 0:
                break
            time.sleep(2)
    finally:
        q.stop()

    got = {
        tuple(r)
        for r in spark.read.parquet(str(out_path)).collect()
    }
    batch_df = spark.createDataFrame(rows, schema)
    expected = {
        tuple(r)
        for r in batch_df.groupBy(
            F.window("ts", "1 hour", "15 minutes").start.alias("ws")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("c"),
        )
        .collect()
    }
    # every on-time window finalized exactly once, none extra (the
    # watermark-pusher events' own windows are not yet closed)
    assert expected <= got
    late_windows = got - expected
    assert all(w[0] >= BASE + dt.timedelta(hours=8) for w in late_windows)


def test_ewma_stream_matches_batch_operator(spark, tmp_path):
    """Split an ordered per-key event log into micro-batches at
    arbitrary points; the streamed running EWMA must equal the batch
    operator on the full log, value for value."""
    from aircraftutilization_etl_spark.operators.events import ewma
    from aircraftutilization_etl_spark.streaming.events_stream import ewma_stream

    in_dir = tmp_path / "ewma_in"
    in_dir.mkdir()
    rows = []
    eid = 0
    for minute in range(12):
        for user in (1, 2):
            rows.append(
                (eid, BASE + dt.timedelta(minutes=minute), "click",
                 float((eid * 7) % 13), user)
            )
            eid += 1
    # three uneven batches, each internally in event order
    cuts = [rows[:5], rows[5:6], rows[6:]]
    for i, chunk in enumerate(cuts):
        _write_batch(in_dir / f"b{i}.parquet", rows=chunk, order=i, with_user=True)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double, "
            "user_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
        .select("user_id", "ts", "event_id", "value")
    )
    out_dir = str(tmp_path / "ewma_out")
    q = (
        ewma_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if spark.read.parquet(out_dir).count() == len(rows):
                    break
            except Exception:
                pass
            time.sleep(0.5)
        streamed = {
            (r.user_id, r.event_id): r.ewma
            for r in spark.read.parquet(out_dir).collect()
        }
    finally:
        q.stop()

    batch_df = spark.createDataFrame(
        [(u, ts, e, v) for (e, ts, _t, v, u) in rows],
        "user_id long, ts timestamp, event_id long, value double",
    )
    expected = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma(batch_df, "user_id", "ts", "value", "event_id").collect()
    }
    assert streamed == expected
