"""Structured Streaming variant of the flight-session pipeline.

The reference implements a stateful stream by hand: an Airflow DAG every
5 minutes reads a keyed state parquet, full-outer-merges the live
snapshot, detects takeoffs/landings, and overwrites the state file
(SURVEY.md §0, §2.9). Here the same session semantics run as a native
Spark Structured Streaming job: ``applyInPandasWithState`` keyed by
``icao24`` holds the per-aircraft session, a 20-minute
ProcessingTimeTimeout replaces the hand-rolled TTL eviction
(reference INACTIVITY_MAX_MINUTES, opensky/transformers.py:24,85-97),
and completed flights are emitted append-mode.

Semantic equivalence with the batch path (operators/flight.py), proven
by tests/test_streaming.py replaying identical micro-batch sequences
through both:

- C3 tri-state rotate: in the batch path ``is_first_contact`` is NULL on
  the cycle a key first appears (→ rotated to True), then True→False on
  the *next* cycle whether or not the key is seen again. Net effect: the
  flag is True during exactly the first cycle of a session. Streaming
  replicates that by treating only a session's first event as
  first-contact.
- U1 status uses the *prior* cycle's trajectory (classification runs
  before the U2 trajectory update in EP2 — complete_flights/
  transformers.py:155-171); the fold preserves that ordering.
- U2 sticky descend survives unseen cycles in the batch path (unseen
  rows get vertical_rate=0 which keeps descend, and climb decays to
  "other" — but status only tests ``== 'descend'``, so skipping
  unseen-cycle updates is emission-equivalent).
- F2: landing rows leave the session state unconditionally, but only
  those with an observed takeoff (takeoff_at != 0) are emitted.
- F1 TTL: state evicted silently after 20 idle minutes (no emission),
  matching ``remove_inactive``. The batch path measures idleness in
  event time (flight_last_contact vs now); the stream uses
  processing-time timeout, the standard Spark realization.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.flight import INACTIVITY_MAX_MINUTES

# Per-aircraft session state carried between micro-batches — the
# streaming realization of the reference's source.parquet row
# (SourceColumns, src/plugins/common/constants.py:13-21) minus the
# per-cycle transient columns.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("takeoff_at", IntegerType()),
        StructField("flight_last_contact", IntegerType()),
        StructField("flight_trajectory", StringType()),
        StructField("first_event_done", BooleanType()),
    ]
)

# Emitted completed flights, pre-enrichment (reference _transform_complete
# output before the metadata join, complete_flights/transformers.py:123-151).
COMPLETED_SCHEMA = StructType(
    [
        StructField("icao24", StringType()),
        StructField("flight_duration_minutes", IntegerType()),
        StructField("landed_at", TimestampType()),
    ]
)


def _num(v: Any) -> float:
    """C1 sentinel: missing measures read as 0 (na.fill in merge_states)."""
    if v is None:
        return 0.0
    f = float(v)
    return 0.0 if math.isnan(f) else f


def fold_events(
    events: Iterable[tuple[int, float, float]],
    session: tuple[int, int, str, bool] | None,
) -> tuple[list[tuple[int, int]], tuple[int, int, str, bool] | None]:
    """Fold (last_contact, velocity, vertical_rate) events into a session.

    Pure function — the whole per-key kernel, shared by the streaming
    wrapper and the unit tests. Each event replays one reference
    merge+classify cycle (EP1 then EP2) for its key:

    merge (C1/C2/C3) → classify U1 with prior trajectory → on landing,
    drop session and emit (takeoff_at, landed_at_epoch) if a takeoff was
    observed (F2) → else stamp takeoff (C4) and update trajectory (U2).

    Returns (emissions, new_session); new_session None means the session
    ended (landing) or never started.
    """
    emissions: list[tuple[int, int]] = []
    for last_contact, velocity, vertical_rate in events:
        lc = int(last_contact)
        vel = _num(velocity)
        vr = _num(vertical_rate)
        if session is None:
            takeoff_at, flc, trajectory, first_done = 0, 0, "other", False
        else:
            takeoff_at, flc, trajectory, first_done = session
        is_first = not first_done
        if lc != 0:  # C2 carry-forward
            flc = lc

        # U1 — reference _determine_flight_status
        # (complete_flights/transformers.py:37-71); NaN legs collapsed to
        # the 0 sentinel by _num, mirroring the batch fillna.
        is_takeoff = is_first and vr > 0
        is_landing = (
            lc != 0
            and vr == 0
            and ((trajectory == "descend" and vel < 10) or vel == 0)
        )

        if is_landing:
            if takeoff_at != 0:
                emissions.append((takeoff_at, lc))
            session = None
            continue
        if is_takeoff:  # C4
            takeoff_at = flc
        # U2 — vr>0 climb; vr<0 or sticky descend; else other
        if vr > 0:
            trajectory = "climb"
        elif vr < 0 or trajectory == "descend":
            trajectory = "descend"
        else:
            trajectory = "other"
        session = (takeoff_at, flc, trajectory, True)
    return emissions, session


def _update_session(
    key: tuple[str],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function (one key = one aircraft)."""
    if state.hasTimedOut:  # F1 — silent eviction, no emission
        state.remove()
        return
    session = tuple(state.get) if state.exists else None
    rows: list[tuple[int, float, float]] = []
    for pdf in pdf_iter:
        for r in pdf.itertuples(index=False):
            rows.append((r.last_contact, r.velocity, r.vertical_rate))
    rows.sort(key=lambda t: t[0])  # replay in event order
    emissions, session = fold_events(rows, session)
    if session is None:
        if state.exists:
            state.remove()
    else:
        state.update(session)
        state.setTimeoutDuration(INACTIVITY_MAX_MINUTES * 60 * 1000)
    if emissions:
        yield pd.DataFrame(
            {
                "icao24": [key[0]] * len(emissions),
                "flight_duration_minutes": [
                    math.ceil((lc - t) / 60) for t, lc in emissions  # U3
                ],
                "landed_at": [
                    pd.Timestamp(lc, unit="s") for _, lc in emissions  # T2
                ],
            }
        )


def completed_flights_stream(states_stream: DataFrame) -> DataFrame:
    """states stream (icao24, last_contact, velocity, vertical_rate) →
    append-mode stream of completed flights (pre-enrichment).

    Scale: state lives in the executor-local state store, partitioned by
    the grouping key — the shuffle is one hash exchange on icao24 per
    micro-batch; no global state file is rewritten (the reference
    rewrites its entire source.parquet every 5 minutes,
    opensky/transformers.py:144-146).
    """
    return states_stream.groupBy("icao24").applyInPandasWithState(
        _update_session,
        outputStructType=COMPLETED_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def enrich_completed(completed: DataFrame, metadata: DataFrame) -> DataFrame:
    """J2/T3 on the stream: stream-static broadcast left join with the
    aircraft dimension + built parse — identical output shape to the
    batch ``transform_complete`` (operators/flight.py)."""
    out = completed.join(F.broadcast(metadata), on="icao24", how="left")
    out = out.withColumn(
        "built", F.try_to_timestamp(F.col("built"), F.lit("yyyy-MM-dd"))
    )
    return out.select(
        "icao24",
        "flight_duration_minutes",
        "landed_at",
        "registration",
        "model",
        "manufacturer_icao",
        "owner",
        "operator",
        "built",
    )


def run_flight_stream(
    states_stream: DataFrame,
    metadata: DataFrame,
    facts_path: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Wire the full streaming pipeline to a parquet append sink
    partitioned by landing date (the engine-native realization of the
    reference's Mongo time-series sink, SURVEY.md S6)."""
    facts = enrich_completed(completed_flights_stream(states_stream), metadata)
    facts = facts.withColumn("landed_date", F.to_date("landed_at"))
    writer = (
        facts.writeStream.format("parquet")
        .option("path", facts_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("landed_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 minutes")
    return writer.start()
