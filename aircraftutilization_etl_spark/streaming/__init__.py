from .flight_stream import (
    COMPLETED_SCHEMA,
    SESSION_STATE_SCHEMA,
    completed_flights_stream,
    enrich_completed,
    fold_events,
    run_flight_stream,
)

__all__ = [
    "COMPLETED_SCHEMA",
    "SESSION_STATE_SCHEMA",
    "completed_flights_stream",
    "enrich_completed",
    "fold_events",
    "run_flight_stream",
]
