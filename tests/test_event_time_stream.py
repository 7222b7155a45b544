"""Event-time flight-session stream: late/out-of-order equivalence.

The processing-time kernel folds packets in arrival order, so a packet
delivered one micro-batch late is folded out of sequence. The event-time
kernel (completed_flights_stream_event_time) buffers packets in the state
store until the watermark seals them, then folds in event-time order —
so a late-but-within-watermark replay must produce exactly the flights
the batch pipeline produces when fed the same packets in event order.

Layer 1: unit tests of _update_session_event_time with a fake GroupState
(watermark gating, timeout drain, buffer carry).
Layer 2: end-to-end — out-of-order micro-batches through the streaming
pipeline vs in-order cycles through the batch FlightPipeline.
"""

from __future__ import annotations

import math
import os
import time

import pandas as pd
import pytest

from aircraftutilization_etl_spark.pipeline import FlightPipeline
from aircraftutilization_etl_spark.streaming.flight_stream import (
    TTL_MS,
    _update_session_event_time,
    run_flight_stream,
)

T0 = 1712338215  # 2024-04-05 17:30:15 UTC


class FakeEventTimeState:
    def __init__(self, value=None, timed_out=False, watermark_ms=0):
        self._value = value
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.removed = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("no state")
        return self._value

    def getCurrentWatermarkMs(self):
        return self._wm

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutTimestamp(self, ms):
        self.timeout_ts = ms


def _pdf(rows):
    return pd.DataFrame(
        rows, columns=["last_contact", "velocity", "vertical_rate"]
    )


class TestEventTimeKernel:
    def test_buffers_until_watermark(self):
        # watermark behind the packet -> nothing folds, packet buffered
        state = FakeEventTimeState(watermark_ms=(T0 - 100) * 1000)
        out = list(
            _update_session_event_time(
                ("a1",), iter([_pdf([(T0, 120.0, 8.0)])]), state
            )
        )
        assert out == []
        assert state.exists
        (_, _, _, _, has_sess, bl, _, _) = state.get
        assert not has_sess and list(bl) == [T0]
        # timeout anchored at last event + TTL
        assert state.timeout_ts == T0 * 1000 + TTL_MS

    def test_folds_sealed_reordered_packets(self):
        # two packets arrive in reverse event order, watermark covers both:
        # fold must reorder them (climb at T0, landing at T0+60)
        state = FakeEventTimeState(watermark_ms=(T0 + 60) * 1000)
        out = list(
            _update_session_event_time(
                ("a1",),
                iter([_pdf([(T0 + 60, 0.0, 0.0), (T0, 120.0, 8.0)])]),
                state,
            )
        )
        assert len(out) == 1
        row = out[0].iloc[0]
        assert row["icao24"] == "a1"
        assert row["flight_duration_minutes"] == math.ceil(60 / 60)
        assert not state.exists  # session closed by the landing

    def test_timeout_drains_buffer_and_emits(self):
        # session holds a takeoff; landing packet still buffered when the
        # TTL timeout fires -> the drain fold must emit the flight
        state = FakeEventTimeState(
            value=(T0, T0, "climb", True, True, [T0 + 300], [0.0], [0.0]),
            timed_out=True,
            watermark_ms=(T0 + 300) * 1000 + TTL_MS + 1,
        )
        out = list(_update_session_event_time(("a1",), iter([]), state))
        assert state.removed
        assert len(out) == 1
        assert out[0].iloc[0]["flight_duration_minutes"] == math.ceil(300 / 60)

    def test_timeout_without_landing_evicts_silently(self):
        state = FakeEventTimeState(
            value=(T0, T0, "climb", True, True, [], [], []),
            timed_out=True,
            watermark_ms=(T0 + 1) * 1000 + TTL_MS,
        )
        out = list(_update_session_event_time(("a1",), iter([]), state))
        assert out == [] and state.removed

    def test_partial_seal_keeps_pending(self):
        # watermark seals the first packet only; second stays buffered
        state = FakeEventTimeState(watermark_ms=T0 * 1000)
        list(
            _update_session_event_time(
                ("a1",),
                iter([_pdf([(T0, 120.0, 8.0), (T0 + 600, 200.0, 0.5)])]),
                state,
            )
        )
        (_, flc, traj, _, has_sess, bl, _, _) = state.get
        assert has_sess and flc == T0 and traj == "climb"
        assert list(bl) == [T0 + 600]
        assert state.timeout_ts == (T0 + 600) * 1000 + TTL_MS


@pytest.mark.slow
class TestEventTimeEquivalence:
    def _state_vector(self, icao, t, vel, vr):
        return [icao, "CS", "US", t, t, 1.0, 2.0, 100.0, False,
                vel, 10.0, vr, None, 120.0, None, False, 0]

    def test_out_of_order_replay_matches_batch(self, spark, tmp_path):
        # Event-order truth: a1 takes off, cruises, descends, lands;
        # b2 is level from first contact then stops (no takeoff -> F2).
        cycles = [
            [("a1", T0, 120.0, 8.0), ("b2", T0, 100.0, 0.0)],
            [("a1", T0 + 600, 200.0, 0.5)],
            [("a1", T0 + 1200, 150.0, -5.0), ("b2", T0 + 1200, 0.0, 0.0)],
            [("a1", T0 + 1800, 5.0, 0.0)],
        ]
        meta_csv = tmp_path / "aircraft.csv"
        meta_csv.write_text(
            "icao24,manufacturericao,model,operator,owner,registration,"
            "serialnumber,built\n"
            "a1,AIRBUS,A320,OpCo,OwnCo,N123,SN1,2015-06-01\n"
        )

        # --- batch pipeline, packets in event order
        pipe = FlightPipeline(
            spark,
            state_root=str(tmp_path / "state"),
            facts_path=str(tmp_path / "facts_batch"),
            metadata_path=str(tmp_path / "meta"),
        )
        pipe.run_metadata_etl(str(meta_csv))
        for i, batch in enumerate(cycles):
            now = T0 + i * 600
            payload = {
                "time": now,
                "states": [self._state_vector(*ev) for ev in batch],
            }
            pipe.run_active_flights(payload, now_epoch=now)
            pipe.run_complete_flights()
        batch_facts = spark.read.parquet(str(tmp_path / "facts_batch"))

        # --- streaming, packets REORDERED across micro-batches: the
        # descend packet (T0+1200) is delivered before the cruise packet
        # (T0+600). Lateness 900s keeps the watermark (max_ts - 900)
        # behind the late packet when it lands in batch 2.
        batches = [
            [("a1", T0, 120.0, 8.0), ("b2", T0, 100.0, 0.0)],
            [("a1", T0 + 1200, 150.0, -5.0), ("b2", T0 + 1200, 0.0, 0.0)],
            [("a1", T0 + 600, 200.0, 0.5)],   # late, within watermark
            [("a1", T0 + 1800, 5.0, 0.0)],
        ]
        input_dir = tmp_path / "stream_in"
        input_dir.mkdir()

        def _write_batch(i, batch):
            pdf = pd.DataFrame(
                batch,
                columns=["icao24", "last_contact", "velocity", "vertical_rate"],
            )
            path = input_dir / f"batch_{i:04d}.parquet"
            pdf.to_parquet(path)
            os.utime(path, (T0 + i, T0 + i))  # stable discovery order

        for i, batch in enumerate(batches):
            _write_batch(i, batch)

        states_stream = (
            spark.readStream.schema(
                "icao24 string, last_contact long, velocity double, "
                "vertical_rate double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(input_dir))
        )
        metadata = spark.read.parquet(str(tmp_path / "meta"))
        query = run_flight_stream(
            states_stream,
            metadata,
            facts_path=str(tmp_path / "facts_stream"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            event_time=True,
            lateness="15 minutes",
            processing_interval="1 second",
        )
        # Drain: feed watermark-advancing heartbeats (a dummy key far in
        # the future) until the a1 session's TTL timeout fires and its
        # buffered landing is folded. processingTime trigger (not
        # availableNow) so the watermark advances batch by batch.
        try:
            deadline = time.time() + 120
            flush_ts = T0 + 1800 + TTL_MS // 1000 + 1000
            i = len(batches)
            while time.time() < deadline:
                try:
                    got = spark.read.parquet(
                        str(tmp_path / "facts_stream")
                    ).count()
                except Exception:
                    got = 0
                if got >= 1:
                    break
                _write_batch(i, [("zz", flush_ts + i * 60, 100.0, 0.0)])
                i += 1
                time.sleep(2)
            else:
                pytest.fail("stream did not emit within deadline")
        finally:
            query.stop()

        stream_facts = spark.read.parquet(str(tmp_path / "facts_stream"))
        # batch_id is batch-pipeline lineage (state generation); streaming
        # exactly-once comes from the checkpoint, so compare business cols.
        cols = sorted(set(batch_facts.columns) & set(stream_facts.columns))
        assert {"icao24", "flight_duration_minutes", "landed_at",
                "model", "registration"} <= set(cols)
        got_b = sorted(tuple(r) for r in batch_facts.select(*cols).collect())
        got_s = sorted(tuple(r) for r in stream_facts.select(*cols).collect())
        assert got_b == got_s
        assert len(got_b) == 1  # only a1 completed a flight
        assert got_b[0][cols.index("icao24")] == "a1"
        assert got_b[0][cols.index("model")] == "A320"
