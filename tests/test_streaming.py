"""Streaming flight-session kernel tests.

Layer 1: truth-table tests of the pure ``fold_events`` kernel (mirrors
the reference's per-branch kernel tests, SURVEY.md §5).
Layer 2: ``_update_session`` against a fake GroupState (timeout path).
Layer 3: equivalence — an identical micro-batch sequence replayed through
the batch FlightPipeline and the Structured Streaming pipeline yields the
same completed flights (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest
from stream_poll import drain_available_now

from aircraftutilization_etl_spark.pipeline import FlightPipeline
from aircraftutilization_etl_spark.streaming.flight_stream import (
    _update_session,
    fold_events,
    run_flight_stream,
)

T0 = 1712338215  # 2024-04-05 17:30:15 UTC


class TestFoldEvents:
    def test_takeoff_then_landing_emits_one_flight(self):
        events = [
            (T0, 120.0, 8.0),        # first contact, climbing -> takeoff
            (T0 + 600, 200.0, 0.5),  # cruise
            (T0 + 1200, 150.0, -5.0),  # descend
            (T0 + 1800, 5.0, 0.0),   # slow, level, after descend -> landing
        ]
        emissions, session = fold_events(events, None)
        assert emissions == [(T0, T0 + 1800)]
        assert session is None  # session closed

    def test_landing_without_takeoff_not_emitted(self):
        # F2: first contact already level (no climb seen) then stops.
        events = [(T0, 100.0, 0.0), (T0 + 60, 0.0, 0.0)]
        emissions, session = fold_events(events, None)
        assert emissions == []
        assert session is None  # still leaves state

    def test_takeoff_requires_first_contact(self):
        # climbing but session already established -> no takeoff stamp
        _, session = fold_events([(T0, 100.0, 0.0)], None)
        assert session is not None and session[0] == 0  # no takeoff_at
        _, session = fold_events([(T0 + 60, 120.0, 8.0)], session)
        assert session[0] == 0  # still none: is_first already consumed

    def test_landing_needs_descend_or_zero_velocity(self):
        # vr=0, vel=50, trajectory 'other' -> not landing (U1 negative leg)
        _, session = fold_events([(T0, 120.0, 8.0), (T0 + 60, 50.0, 0.0)], None)
        assert session is not None
        # descend first, then slow -> landing
        emissions, session = fold_events(
            [(T0 + 120, 100.0, -3.0), (T0 + 180, 9.0, 0.0)], session
        )
        assert emissions == [(T0, T0 + 180)]

    def test_nan_measures_use_zero_sentinel(self):
        # NaN velocity/vr behave as 0 (C1 fillna parity): landing leg fires
        emissions, _ = fold_events(
            [(T0, 120.0, 8.0), (T0 + 60, float("nan"), float("nan"))], None
        )
        assert emissions == [(T0, T0 + 60)]

    def test_sticky_descend_survives_level_cycle(self):
        # descend, then level-but-fast (no landing), then slow -> landing
        events = [
            (T0, 120.0, 8.0),
            (T0 + 60, 150.0, -4.0),   # descend
            (T0 + 120, 80.0, 0.0),    # vel>=10, still descend (sticky)
            (T0 + 180, 3.0, 0.0),     # slow -> landing
        ]
        emissions, _ = fold_events(events, None)
        assert emissions == [(T0, T0 + 180)]

    def test_session_restarts_after_landing(self):
        # same aircraft takes off again after landing: two emissions
        events = [
            (T0, 120.0, 8.0),
            (T0 + 600, 0.0, 0.0),          # landing 1
            (T0 + 1200, 110.0, 6.0),       # new session, first contact again
            (T0 + 1800, 0.0, 0.0),         # landing 2
        ]
        emissions, _ = fold_events(events, None)
        assert emissions == [(T0, T0 + 600), (T0 + 1200, T0 + 1800)]

    def test_event_time_gap_evicts_session(self):
        # F1 in event time: a key silent >= 20 min returns to a FRESH
        # session (batch remove_inactive parity) — takeoff re-armed, so
        # the post-gap climb stamps a takeoff and the landing emits a
        # flight measured from the RETURN, not the stale session
        events = [
            (T0, 120.0, 0.0),          # first contact, level: no takeoff
            (T0 + 1200, 110.0, 6.0),   # gap == TTL exactly -> fresh, takeoff
            (T0 + 1500, 0.0, 0.0),     # landing
        ]
        emissions, _ = fold_events(events, None)
        assert emissions == [(T0 + 1200, T0 + 1500)]

    def test_gap_below_ttl_keeps_session(self):
        # one second inside the TTL: session survives, takeoff was never
        # stamped (first contact was level), so the landing emits nothing
        events = [
            (T0, 120.0, 0.0),
            (T0 + 1199, 110.0, 6.0),   # climb but NOT first -> no takeoff
            (T0 + 1400, 0.0, 0.0),     # landing, takeoff_at == 0 -> silent
        ]
        emissions, _ = fold_events(events, None)
        assert emissions == []

    def test_untimestamped_packet_skips_gap_check(self):
        # lc == 0 carries no event time: it folds into the stale session
        # (documented residual asymmetry) and cannot land or emit
        events = [
            (T0, 120.0, 8.0),          # takeoff
            (0, 100.0, 0.0),           # null-timestamp packet mid-gap
            (T0 + 1200, 0.0, 0.0),     # gap >= TTL vs flc=T0 -> fresh, lands silently
        ]
        emissions, session = fold_events(events, None)
        assert emissions == []
        assert session is None


class FakeGroupState:
    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("no state")
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


class TestUpdateSession:
    def _pdf(self, rows):
        return pd.DataFrame(
            rows, columns=["last_contact", "velocity", "vertical_rate"]
        )

    def test_timeout_evicts_silently(self):
        state = FakeGroupState(value=(T0, T0, "climb", True), timed_out=True)
        out = list(_update_session(("abc",), iter([]), state))
        assert out == [] and state.removed

    def test_emission_schema_and_duration(self):
        state = FakeGroupState()
        pdfs = iter([self._pdf([(T0, 120.0, 8.0), (T0 + 90, 0.0, 0.0)])])
        out = list(_update_session(("abc",), pdfs, state))
        assert len(out) == 1
        row = out[0].iloc[0]
        assert row["icao24"] == "abc"
        assert row["flight_duration_minutes"] == math.ceil(90 / 60)
        assert row["landed_at"] == pd.Timestamp(T0 + 90, unit="s")
        assert not state.exists  # session closed

    def test_active_session_sets_timeout(self):
        state = FakeGroupState()
        pdfs = iter([self._pdf([(T0, 120.0, 8.0)])])
        out = list(_update_session(("abc",), pdfs, state))
        assert out == []
        assert state.exists and state.timeout_ms == 20 * 60 * 1000


@pytest.mark.slow
class TestBatchStreamEquivalence:
    def _state_vector(self, icao, t, vel, vr):
        return [icao, "CS", "US", t, t, 1.0, 2.0, 100.0, False,
                vel, 10.0, vr, None, 120.0, None, False, 0]

    def test_same_batches_same_flights(self, spark, tmp_path):
        # aircraft A: takeoff -> cruise -> descend -> landing (emits)
        # aircraft B: level first contact -> stops (landing, no takeoff)
        batches = [
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

        # --- batch pipeline
        pipe = FlightPipeline(
            spark,
            state_root=str(tmp_path / "state"),
            facts_path=str(tmp_path / "facts_batch"),
            metadata_path=str(tmp_path / "meta"),
        )
        pipe.run_metadata_etl(str(meta_csv))
        for i, batch in enumerate(batches):
            now = T0 + i * 600
            payload = {
                "time": now,
                "states": [self._state_vector(*ev) for ev in batch],
            }
            pipe.run_active_flights(payload, now_epoch=now)
            pipe.run_complete_flights()
        batch_facts = spark.read.parquet(str(tmp_path / "facts_batch"))

        # --- streaming pipeline: one parquet file per micro-batch,
        # maxFilesPerTrigger=1 preserves batch boundaries.
        input_dir = tmp_path / "stream_in"
        input_dir.mkdir()
        for i, batch in enumerate(batches):
            pdf = pd.DataFrame(
                batch,
                columns=["icao24", "last_contact", "velocity", "vertical_rate"],
            )
            path = input_dir / f"batch_{i}.parquet"
            pdf.to_parquet(path)
            os.utime(path, (T0 + i, T0 + i))  # stable discovery order
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
            available_now=True,
        )
        # drain-then-stop (see stream_poll): the pending 20-min TTL
        # timers keep no-data batches firing, so the query never
        # self-terminates here — awaitTermination(120) burned its full
        # timeout and leaked the running query into the shared session
        drain_available_now(query)
        stream_facts = spark.read.parquet(str(tmp_path / "facts_stream"))

        # batch_id is batch-pipeline lineage (state generation); streaming
        # exactly-once comes from the checkpoint, so compare business cols.
        cols = sorted(set(batch_facts.columns) & set(stream_facts.columns))
        assert {"icao24", "flight_duration_minutes", "landed_at",
                "model", "registration"} <= set(cols)
        got_b = sorted(tuple(r) for r in batch_facts.select(*cols).collect())
        got_s = sorted(tuple(r) for r in stream_facts.select(*cols).collect())
        assert got_b == got_s
        assert len(got_b) == 1  # only aircraft A completed a flight
        assert got_b[0][cols.index("icao24")] == "a1"
        assert got_b[0][cols.index("model")] == "A320"


@pytest.mark.slow
class TestCheckpointRecovery:
    """Layer 4: stop/restart durability. An open session checkpointed by
    one query run must survive into a NEW query started on the same
    checkpoint — the property a 100 TB deployment leans on for executor
    loss, code redeploys, and trigger=availableNow refresh loops. The
    state store (keyed session state), the file-source offset log, and
    the sink commit log are all exercised: the split run must emit
    exactly the single-run answer, exactly once."""

    def _state_file(self, dirpath, i, rows):
        pdf = pd.DataFrame(
            rows,
            columns=["icao24", "last_contact", "velocity", "vertical_rate"],
        )
        path = dirpath / f"batch_{i}.parquet"
        pdf.to_parquet(path)
        os.utime(path, (T0 + i, T0 + i))  # stable discovery order

    def _run_available_now(self, spark, input_dir, metadata, facts, ckpt):
        states = (
            spark.readStream.schema(
                "icao24 string, last_contact long, velocity double, "
                "vertical_rate double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(input_dir))
        )
        query = run_flight_stream(
            states,
            metadata,
            facts_path=str(facts),
            checkpoint_dir=str(ckpt),
            available_now=True,
        )
        # drain-then-stop, not awaitTermination: pending TTL timers
        # keep the availableNow query alive long past any test timeout
        drain_available_now(query)

    def _facts(self, spark, path, cols):
        try:
            df = spark.read.parquet(str(path))
        except Exception:
            return []
        return sorted(tuple(r) for r in df.select(*cols).collect())

    def test_open_session_survives_restart(self, spark, tmp_path):
        # same event sequence as TestBatchStreamEquivalence, split so the
        # restart lands mid-flight: a1 has taken off but not landed when
        # the first query terminates.
        first = [
            [("a1", T0, 120.0, 8.0), ("b2", T0, 100.0, 0.0)],
            [("a1", T0 + 600, 200.0, 0.5)],
        ]
        second = [
            [("a1", T0 + 1200, 150.0, -5.0), ("b2", T0 + 1200, 0.0, 0.0)],
            [("a1", T0 + 1800, 5.0, 0.0)],
        ]
        meta_csv = tmp_path / "aircraft.csv"
        meta_csv.write_text(
            "icao24,manufacturericao,model,operator,owner,registration,"
            "serialnumber,built\n"
            "a1,AIRBUS,A320,OpCo,OwnCo,N123,SN1,2015-06-01\n"
        )
        pipe = FlightPipeline(
            spark,
            state_root=str(tmp_path / "state"),
            facts_path=str(tmp_path / "facts_unused"),
            metadata_path=str(tmp_path / "meta"),
        )
        pipe.run_metadata_etl(str(meta_csv))
        metadata = spark.read.parquet(str(tmp_path / "meta"))

        cols = ["icao24", "flight_duration_minutes", "landed_at", "model",
                "registration"]
        split_in = tmp_path / "split_in"
        split_in.mkdir()
        split_facts = tmp_path / "split_facts"
        split_ckpt = tmp_path / "split_ckpt"

        # run 1: takeoff + cruise only -> terminates with the session OPEN
        for i, rows in enumerate(first):
            self._state_file(split_in, i, rows)
        self._run_available_now(spark, split_in, metadata, split_facts,
                                split_ckpt)
        assert self._facts(spark, split_facts, cols) == []

        # run 2: NEW query, same checkpoint; recovered state must carry
        # the takeoff so the landing completes the flight
        for i, rows in enumerate(second, start=len(first)):
            self._state_file(split_in, i, rows)
        self._run_available_now(spark, split_in, metadata, split_facts,
                                split_ckpt)
        got_split = self._facts(spark, split_facts, cols)

        # single-run control on the identical files, fresh checkpoint
        solo_in = tmp_path / "solo_in"
        solo_in.mkdir()
        for i, rows in enumerate(first + second):
            self._state_file(solo_in, i, rows)
        self._run_available_now(spark, solo_in, metadata,
                                tmp_path / "solo_facts",
                                tmp_path / "solo_ckpt")
        got_solo = self._facts(spark, tmp_path / "solo_facts", cols)

        assert got_split == got_solo
        assert len(got_split) == 1  # a1 completed; b2 never took off
        assert got_split[0][cols.index("icao24")] == "a1"
        assert got_split[0][cols.index("model")] == "A320"

        # run 3: idle restart — no new input, no duplicate emission
        self._run_available_now(spark, split_in, metadata, split_facts,
                                split_ckpt)
        assert self._facts(spark, split_facts, cols) == got_split
