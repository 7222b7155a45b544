from .flight import (
    flight_duration_minutes_expr,
    flight_status_expr,
    flight_trajectory_expr,
    is_landing_expr,
    is_takeoff_expr,
)

__all__ = [
    "flight_duration_minutes_expr",
    "flight_status_expr",
    "flight_trajectory_expr",
    "is_landing_expr",
    "is_takeoff_expr",
]
