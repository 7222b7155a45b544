"""Truth-table tests of the decision kernels.

Mirrors the reference's per-branch scalar tests of _is_takeoff /
_is_landing / _determine_flight_status / _determine_flight_trajectory
(src/tests/plugins/scripts/complete_flights/test_transform.py:57-275),
re-expressed at the Column-expression level (SURVEY.md §5b).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from aircraftutilization_etl_spark.functions.flight import (
    flight_duration_minutes_expr,
    flight_status_expr,
    flight_trajectory_expr,
)

ROW_SCHEMA = StructType(
    [
        StructField("last_contact", IntegerType()),
        StructField("velocity", DoubleType()),
        StructField("vertical_rate", DoubleType()),
        StructField("takeoff_at", IntegerType()),
        StructField("flight_trajectory", StringType()),
        StructField("is_first_contact", BooleanType()),
    ]
)


def classify_one(spark, **kwargs):
    row = {
        "last_contact": 1712338215,
        "velocity": 100.0,
        "vertical_rate": 5.0,
        "takeoff_at": 0,
        "flight_trajectory": "other",
        "is_first_contact": False,
    }
    row.update(kwargs)
    df = spark.createDataFrame([row], ROW_SCHEMA)
    return df.select(flight_status_expr().alias("s")).first()["s"]


def trajectory_one(spark, **kwargs):
    row = {
        "last_contact": 1712338215,
        "velocity": 100.0,
        "vertical_rate": 5.0,
        "takeoff_at": 0,
        "flight_trajectory": "other",
        "is_first_contact": False,
    }
    row.update(kwargs)
    df = spark.createDataFrame([row], ROW_SCHEMA)
    return df.select(flight_trajectory_expr().alias("t")).first()["t"]


# -- takeoff branch (reference test_transform.py:57-99) -----------------

def test_takeoff_first_contact_climbing(spark):
    assert classify_one(spark, is_first_contact=True, vertical_rate=6.3) == "takeoff"


def test_no_takeoff_when_not_first_contact(spark):
    assert classify_one(spark, is_first_contact=False, vertical_rate=6.3) == "other"


def test_no_takeoff_when_first_contact_null(spark):
    assert classify_one(spark, is_first_contact=None, vertical_rate=6.3) == "other"


def test_no_takeoff_when_not_climbing(spark):
    assert classify_one(spark, is_first_contact=True, vertical_rate=0.0) != "takeoff"


# -- landing branch (reference test_transform.py:101-199) ---------------

def test_landing_descend_slow(spark):
    assert (
        classify_one(
            spark,
            vertical_rate=0.0,
            flight_trajectory="descend",
            velocity=9.11,
        )
        == "landing"
    )


def test_landing_zero_velocity(spark):
    assert classify_one(spark, vertical_rate=0.0, velocity=0.0) == "landing"


def test_landing_null_velocity(spark):
    assert classify_one(spark, vertical_rate=0.0, velocity=None) == "landing"


def test_landing_null_vertical_rate(spark):
    assert classify_one(spark, vertical_rate=None, velocity=0.0) == "landing"


def test_no_landing_when_not_seen_this_batch(spark):
    # last_contact == 0 sentinel excludes state-only rows (SURVEY.md §4.4.5)
    assert classify_one(spark, last_contact=0, vertical_rate=0.0, velocity=0.0) == "other"


def test_no_landing_when_climbing(spark):
    assert classify_one(spark, vertical_rate=2.0, velocity=0.0) == "other"


def test_no_landing_fast_descend(spark):
    assert (
        classify_one(
            spark, vertical_rate=0.0, flight_trajectory="descend", velocity=50.0
        )
        == "other"
    )


def test_takeoff_wins_over_landing(spark):
    assert (
        classify_one(
            spark,
            is_first_contact=True,
            vertical_rate=6.3,
            velocity=0.0,
        )
        == "takeoff"
    )


# -- trajectory (reference test_transform.py:201-275) -------------------

def test_trajectory_climb(spark):
    assert trajectory_one(spark, vertical_rate=7.49) == "climb"


def test_trajectory_descend(spark):
    assert trajectory_one(spark, vertical_rate=-0.7) == "descend"


def test_trajectory_descend_sticky(spark):
    assert trajectory_one(spark, vertical_rate=0.0, flight_trajectory="descend") == "descend"


def test_trajectory_other_level(spark):
    assert trajectory_one(spark, vertical_rate=0.0, flight_trajectory="climb") == "other"


def test_trajectory_null_vertical_rate_falls_to_other(spark):
    assert trajectory_one(spark, vertical_rate=None, flight_trajectory="climb") == "other"


def test_trajectory_null_vertical_rate_sticky_descend(spark):
    assert trajectory_one(spark, vertical_rate=None, flight_trajectory="descend") == "descend"


# -- duration (reference test_transform.py / transformers.py:136-143) ---

@pytest.mark.parametrize(
    "takeoff, landing, minutes",
    [
        (1712329013, 1712338215, 154),  # golden fixture value
        (100, 160, 1),
        (100, 161, 2),  # ceil
        (100, 100, 0),
    ],
)
def test_duration_minutes(spark, takeoff, landing, minutes):
    df = spark.createDataFrame(
        [(takeoff, landing)], "takeoff_at int, last_contact int"
    )
    assert df.select(flight_duration_minutes_expr().alias("d")).first()["d"] == minutes
