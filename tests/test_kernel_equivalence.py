"""Exhaustive null-semantics equivalence for the U1/U2 kernels.

SURVEY.md ranks exact pandas-semantics reproduction under nulls as the
rewrite's #1 hard part (§4.4.2). This test enumerates the FULL
categorical input grid — every combination of tri-state first-contact,
null/zero/signed vertical rate, seen/unseen last-contact, null/zero/
slow/fast velocity, and all trajectories — and compares the Spark
when()-chain results against an independent Python model of the
reference's scalar decision logic (NaN modeled as None):

- takeoff:  is_first_contact == True and vertical_rate > 0
- landing:  last_contact != 0 and (vr == 0 or vr is NaN) and
            ((trajectory == 'descend' and velocity < 10)
             or velocity == 0 or velocity is NaN)
- status:   takeoff wins, then landing, else other
- trajectory: vr > 0 climb; vr < 0 or prior 'descend' -> descend;
              else other (NaN falls through)
"""

from __future__ import annotations

import itertools

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
    flight_status_expr,
    flight_trajectory_expr,
)

IFC_VALUES = (True, False, None)
VR_VALUES = (None, 0.0, 4.5, -3.2, 0.0001)
LC_VALUES = (0, 1712338215)
VEL_VALUES = (None, 0.0, 5.0, 9.99, 10.0, 250.0)
TRAJ_VALUES = ("climb", "descend", "other", None)

SCHEMA = StructType(
    [
        StructField("row_id", IntegerType()),
        StructField("is_first_contact", BooleanType()),
        StructField("vertical_rate", DoubleType()),
        StructField("last_contact", IntegerType()),
        StructField("velocity", DoubleType()),
        StructField("flight_trajectory", StringType()),
    ]
)


def model_status(ifc, vr, lc, vel, traj):
    takeoff = (ifc is True) and (vr is not None and vr > 0)
    landing = (
        lc != 0
        and (vr is None or vr == 0)
        and (
            (traj == "descend" and vel is not None and vel < 10)
            or vel is None
            or vel == 0
        )
    )
    if takeoff:
        return "takeoff"
    if landing:
        return "landing"
    return "other"


def model_trajectory(vr, traj):
    if vr is not None and vr > 0:
        return "climb"
    if (vr is not None and vr < 0) or traj == "descend":
        return "descend"
    return "other"


def test_kernels_match_reference_model_exhaustively(spark):
    grid = list(
        itertools.product(IFC_VALUES, VR_VALUES, LC_VALUES, VEL_VALUES, TRAJ_VALUES)
    )
    rows = [(i, *combo) for i, combo in enumerate(grid)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["row_id"]: (r["status"], r["trajectory"])
        for r in df.select(
            "row_id",
            flight_status_expr().alias("status"),
            flight_trajectory_expr().alias("trajectory"),
        ).collect()
    }
    mismatches = []
    for i, (ifc, vr, lc, vel, traj) in enumerate(grid):
        want = (model_status(ifc, vr, lc, vel, traj), model_trajectory(vr, traj))
        if got[i] != want:
            mismatches.append((dict(ifc=ifc, vr=vr, lc=lc, vel=vel, traj=traj),
                               got[i], want))
    assert not mismatches, f"{len(mismatches)} diverging inputs, first 5: {mismatches[:5]}"
    assert len(got) == len(grid) == 720
