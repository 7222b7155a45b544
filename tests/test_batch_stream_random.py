"""Randomized batch↔stream equivalence.

The single golden scenario in test_streaming.py proves one trajectory;
this test replays SEEDED-RANDOM micro-batch sequences through the real
Spark batch pipeline (merge_states + classify_and_split, driven exactly
like FlightPipeline drives them) and through the streaming fold kernel,
asserting identical emitted flights. Catches divergence in the subtle
interactions: takeoff re-stamping, landings without takeoff, aircraft
reappearing after landing, missing-from-batch cycles, null measures.

TTL eviction is intentionally out of scope here (processing-time in the
stream vs event-time in batch — the documented realization difference);
batch timestamps stay inside the 20-minute gap.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from aircraftutilization_etl_spark.operators.flight import (
    classify_and_split,
    merge_states,
)
from aircraftutilization_etl_spark.schemas import (
    METADATA_SCHEMA,
    SOURCE_SCHEMA,
    STATES_SCHEMA,
    empty_df,
)
from aircraftutilization_etl_spark.streaming.flight_stream import fold_events

T0 = 1712338215
STEP = 300  # 5-minute cadence, well inside the 20-min TTL

AIRCRAFT = ["a1", "b2", "c3"]
VELOCITIES = [0.0, 5.0, 9.5, 80.0, 250.0, None]
RATES = [0.0, 3.5, -4.0, None]


def _random_batches(rng, n_batches):
    batches = []
    for i in range(n_batches):
        t = T0 + i * STEP
        batch = []
        for icao in AIRCRAFT:
            if rng.random() < 0.35:  # sometimes absent this cycle
                continue
            batch.append(
                (icao, t, rng.choice(VELOCITIES), rng.choice(RATES))
            )
        batches.append((t, batch))
    return batches


def _state_vector(icao, t, vel, vr):
    return (icao, "CS", "US", t, t, 1.0, 2.0, 100.0, False,
            vel, 10.0, vr, None, 120.0, None, False, 0)


def _run_batch(spark, batches):
    """Drive the batch operators exactly as FlightPipeline does, keeping
    state in memory between cycles; return emitted (icao, takeoff, land)."""
    state = empty_df(spark, SOURCE_SCHEMA)
    metadata = empty_df(spark, METADATA_SCHEMA)
    emitted = []
    for now, batch in batches:
        states = spark.createDataFrame(
            [_state_vector(*ev) for ev in batch], STATES_SCHEMA
        )
        merged = merge_states(states, state, now_epoch=now)
        flights = classify_and_split(merged, metadata)
        rows = flights.complete.select(
            "icao24", "flight_duration_minutes", "landed_at"
        ).collect()
        emitted.extend(
            (r["icao24"], r["flight_duration_minutes"], r["landed_at"])
            for r in rows
        )
        # materialize next-cycle state (what StateStore.commit would do)
        state = spark.createDataFrame(
            flights.active.collect(), flights.active.schema
        )
    return sorted(emitted)


def _run_fold(spark, batches):
    """Same sequence through the streaming per-key fold kernel."""
    sessions: dict[str, tuple] = {}
    emitted = []
    for _, batch in batches:
        for icao, t, vel, vr in batch:
            nan = float("nan")
            events = [(t, nan if vel is None else vel, nan if vr is None else vr)]
            out, sessions[icao] = fold_events(events, sessions.get(icao))
            for takeoff_at, lc in out:
                emitted.append((icao, -(-(lc - takeoff_at) // 60), lc))
    # normalize landed_at to timestamps via one tiny Spark job (T2 parity)
    if not emitted:
        return []
    df = spark.createDataFrame(
        emitted, "icao24 string, dur long, lc long"
    ).select(
        "icao24", F.col("dur").cast("int"), F.timestamp_seconds("lc")
    )
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_random_sequences_equivalent(spark, seed):
    rng = random.Random(seed)
    batches = _random_batches(rng, n_batches=8)
    got_batch = _run_batch(spark, batches)
    got_fold = _run_fold(spark, batches)
    assert got_batch == got_fold
