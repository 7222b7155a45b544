"""Flight-kernel parity queries — the reference's decision kernels (U1-U3,
C2-C4) exercised on the synthetic events table with independent SQL oracles.

The pytest golden tests (tests/test_flight_transforms.py) prove parity
against the reference's own fixtures; these queries additionally prove the
when()-chain kernels against a DuckDB CASE-WHEN oracle at every scale
factor, through the driver's hash gate.

The mapping from events to a source-like frame is deterministic:
icao24 := user_id, last_contact := epoch-seconds of ts (0 for 'view'
events — the not-seen sentinel), velocity := value, vertical_rate :=
value − 100 (mixed signs), flight_trajectory from event_type, and
is_first_contact := event_type = 'signup'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.flight import (
    flight_duration_minutes_expr,
    flight_status_expr,
    flight_trajectory_expr,
)
from .catalog import query, table

_SOURCE_LIKE_SQL = """
    SELECT event_id,
           CAST(user_id AS VARCHAR) AS icao24,
           CASE WHEN event_type = 'view' THEN 0
                ELSE epoch_us(ts) // 1000000 END AS last_contact,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS velocity,
           CASE WHEN event_type = 'signup' THEN NULL
                ELSE ROUND(value - 100, 2) + 0.0 END AS vertical_rate,
           CASE WHEN event_type = 'click' THEN 'descend'
                WHEN event_type = 'purchase' THEN 'climb'
                ELSE 'other' END AS flight_trajectory,
           event_type = 'signup' AS is_first_contact
    FROM events
"""


def _source_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("user_id").cast("string").alias("icao24"),
        F.when(F.col("event_type") == "view", F.lit(0))
        .otherwise(F.expr("unix_micros(ts) div 1000000"))
        .alias("last_contact"),
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ).alias("velocity"),
        F.when(F.col("event_type") == "signup", F.lit(None))
        .otherwise(F.round(F.col("value") - 100, 2) + 0.0)
        .alias("vertical_rate"),
        F.when(F.col("event_type") == "click", "descend")
        .when(F.col("event_type") == "purchase", "climb")
        .otherwise("other")
        .alias("flight_trajectory"),
        (F.col("event_type") == "signup").alias("is_first_contact"),
    )


@query(
    "q_flight_status_kernel",
    f"""
    WITH source_like AS ({_SOURCE_LIKE_SQL})
    SELECT event_id, icao24,
           CASE WHEN is_first_contact = TRUE AND vertical_rate > 0 THEN 'takeoff'
                WHEN last_contact <> 0
                     AND (vertical_rate = 0 OR vertical_rate IS NULL)
                     AND ((flight_trajectory = 'descend' AND velocity < 10)
                          OR velocity = 0 OR velocity IS NULL)
                     THEN 'landing'
                ELSE 'other' END AS flight_status,
           CASE WHEN vertical_rate > 0 THEN 'climb'
                WHEN vertical_rate < 0 OR flight_trajectory = 'descend'
                     THEN 'descend'
                ELSE 'other' END AS next_trajectory
    FROM source_like
    ORDER BY event_id
    """,
)
def q_flight_status_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 + U2 kernels (takeoff/landing/other, sticky-descend trajectory)
    over 10⁵+ synthetic rows, hash-checked against a CASE-WHEN oracle.

    Reference: _determine_flight_status / _determine_flight_trajectory,
    complete_flights/transformers.py:37-81 — here zero Python, one
    codegen stage.
    """
    src = _source_like(spark, sf_dir)
    return src.select(
        "event_id",
        "icao24",
        flight_status_expr().alias("flight_status"),
        flight_trajectory_expr().alias("next_trajectory"),
    ).orderBy("event_id")


@query(
    "q_flight_session_rollup",
    f"""
    WITH source_like AS ({_SOURCE_LIKE_SQL}),
    takeoffs AS (
        SELECT icao24,
               MIN(last_contact) AS takeoff_at,
               MAX(last_contact) AS last_contact
        FROM source_like WHERE last_contact <> 0
        GROUP BY icao24
    )
    SELECT icao24, takeoff_at, last_contact,
           CAST(CEIL((last_contact - takeoff_at) / 60.0) AS INT)
               AS flight_duration_minutes,
           CAST(to_timestamp(last_contact) AS TIMESTAMP) AS landed_at
    FROM takeoffs
    ORDER BY icao24
    """,
)
def q_flight_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 duration + T2 epoch→timestamp kernels on per-key session spans.

    Reference: get_flight_duration_minutes + landed_at derivation,
    complete_flights/transformers.py:136-146.
    """
    src = _source_like(spark, sf_dir).filter(F.col("last_contact") != 0)
    spans = src.groupBy("icao24").agg(
        F.min("last_contact").alias("takeoff_at"),
        F.max("last_contact").alias("last_contact"),
    )
    return spans.select(
        "icao24",
        "takeoff_at",
        "last_contact",
        flight_duration_minutes_expr().alias("flight_duration_minutes"),
        F.timestamp_seconds("last_contact").alias("landed_at"),
    ).orderBy("icao24")
