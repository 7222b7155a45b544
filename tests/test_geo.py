"""Geospatial proximity join (operators/geo.py): exact haversine checks
and bucket-join completeness vs brute force."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from aircraftutilization_etl_spark.operators.geo import (
    haversine_km,
    proximity_pairs,
)


def _fleet(spark, rows):
    return spark.createDataFrame(
        rows, "icao24 string, latitude double, longitude double"
    )


def _brute(rows, max_km):
    def hav(a, b):
        la1, lo1, la2, lo2 = map(math.radians, (a[1], a[2], b[1], b[2]))
        x = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.atan2(math.sqrt(x), math.sqrt(1 - x))

    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            pa, pb = sorted((a[0], b[0]))
            if round(hav(a, b), 3) <= max_km:
                out.add((pa, pb))
    return out


class TestHaversine:
    def test_known_distance(self, spark):
        # Paris (48.8566, 2.3522) to London (51.5074, -0.1278) ~ 343.5 km
        df = spark.range(1).select(
            haversine_km(
                F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
            ).alias("d")
        )
        assert df.collect()[0].d == pytest.approx(343.5, abs=1.0)


class TestProximityPairs:
    def test_close_pair_across_cell_boundary_found(self, spark):
        # ~1.1 km apart, straddling a 10-km cell boundary in latitude
        rows = [("a", 44.995, 10.0), ("b", 45.005, 10.0), ("c", 48.0, 10.0)]
        got = {
            (r.id_a, r.id_b)
            for r in proximity_pairs(_fleet(spark, rows), 10.0).collect()
        }
        assert got == {("a", "b")}

    def test_matches_brute_force_on_random_fleet(self, spark):
        rng = random.Random(13)
        rows = [
            (f"ac{i:03d}", rng.uniform(40, 60), rng.uniform(-5, 15))
            for i in range(80)
        ]
        for max_km in (25.0, 120.0):
            got = {
                (r.id_a, r.id_b)
                for r in proximity_pairs(_fleet(spark, rows), max_km).collect()
            }
            assert got == _brute(rows, max_km), max_km

    def test_high_latitude_rejected(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import SparkRuntimeException

        df = _fleet(spark, [("a", 80.0, 0.0), ("b", 10.0, 0.0)])
        with pytest.raises((Py4JJavaError, SparkRuntimeException)):
            proximity_pairs(df, 10.0).collect()

    def test_no_cross_join_in_plan(self, spark):
        from aircraftutilization_etl_spark.diagnostics import executed_plan

        df = _fleet(spark, [("a", 45.0, 10.0), ("b", 45.1, 10.0)])
        plan = executed_plan(proximity_pairs(df, 10.0))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_cell_cap_bounds_output_deterministically(self, spark):
        # a dense cluster: 12 aircraft inside one ~2 km disc — uncapped
        # output is all 66 pairs; the cap keeps only pairs whose id_b is
        # among the k lowest ids of its home cell
        rows = [
            (f"ac{i:02d}", 45.0 + i * 0.001, 10.0 + i * 0.001)
            for i in range(12)
        ]
        fleet = _fleet(spark, rows)
        uncapped = {
            (r.id_a, r.id_b, r.distance_km)
            for r in proximity_pairs(fleet, 25.0).collect()
        }
        assert len(uncapped) == 66
        capped = {
            (r.id_a, r.id_b, r.distance_km)
            for r in proximity_pairs(
                fleet, 25.0, max_candidates_per_cell=3
            ).collect()
        }
        # subset of the exact answer, never new or altered pairs
        assert capped <= uncapped
        # all points share one home cell, so id_b ∈ {3 lowest ids};
        # id_a < id_b cuts (a<b) pairs from those: exactly 3 survive
        assert {(a, b) for a, b, _ in capped} == {
            ("ac00", "ac01"),
            ("ac00", "ac02"),
            ("ac01", "ac02"),
        }
        # a generous cap reproduces the exact answer
        full = {
            (r.id_a, r.id_b, r.distance_km)
            for r in proximity_pairs(
                fleet, 25.0, max_candidates_per_cell=100
            ).collect()
        }
        assert full == uncapped


class TestTrackLengths:
    def test_known_path_length_and_single_fix_zero(self, spark):
        from aircraftutilization_etl_spark.operators.geo import track_lengths

        rows = [
            # 1 degree of latitude at constant lon ~ 111.2 km per leg
            ("a", 1, 45.0, 10.0),
            ("a", 2, 46.0, 10.0),
            ("a", 3, 47.0, 10.0),
            ("b", 1, 50.0, 0.0),
        ]
        df = spark.createDataFrame(
            rows, "icao24 string, ts long, latitude double, longitude double"
        )
        got = {r.icao24: r for r in track_lengths(df).collect()}
        assert got["a"].n_fixes == 3 and got["a"].n_legs == 2
        assert abs(got["a"].track_km - 2 * 111.2) < 0.5
        assert got["b"].n_legs == 0 and got["b"].track_km == 0.0

    def test_order_is_by_time_not_input(self, spark):
        from aircraftutilization_etl_spark.operators.geo import track_lengths

        # out-of-order input: a->b->a zigzag by time would double the
        # distance vs the sorted a..b sweep
        rows = [
            ("a", 3, 47.0, 10.0),
            ("a", 1, 45.0, 10.0),
            ("a", 2, 46.0, 10.0),
        ]
        df = spark.createDataFrame(
            rows, "icao24 string, ts long, latitude double, longitude double"
        )
        r = track_lengths(df).collect()[0]
        assert abs(r.track_km - 2 * 111.2) < 0.5


class TestStreamingProximity:
    def test_micro_batch_union_equals_whole_fleet_snapshot(self, spark):
        """Positions arriving across micro-batches: proximity over the
        merged latest-fix snapshot equals the one-shot batch answer —
        the foreachBatch upsert-then-join pattern (latest fix per
        aircraft wins, like the state store's merge)."""
        import random

        from pyspark.sql import functions as F

        from aircraftutilization_etl_spark.operators.geo import proximity_pairs

        rng = random.Random(21)
        fixes = [
            (f"ac{i:02d}", t, rng.uniform(44, 46), rng.uniform(9, 11))
            for i in range(25)
            for t in (1, 2)
        ]
        df = spark.createDataFrame(
            fixes, "icao24 string, ts long, latitude double, longitude double"
        )
        latest = (
            df.groupBy("icao24")
            .agg(F.max(F.struct("ts", "latitude", "longitude")).alias("s"))
            .select(
                "icao24",
                F.col("s.latitude").alias("latitude"),
                F.col("s.longitude").alias("longitude"),
            )
        )
        got = {
            (r.id_a, r.id_b, r.distance_km)
            for r in proximity_pairs(latest, 40.0).collect()
        }
        # scalar snapshot: keep each aircraft's t=2 fix
        snap = {a: (la, lo) for a, t, la, lo in fixes if t == 2}
        whole = spark.createDataFrame(
            [(a, la, lo) for a, (la, lo) in snap.items()],
            "icao24 string, latitude double, longitude double",
        )
        expect = {
            (r.id_a, r.id_b, r.distance_km)
            for r in proximity_pairs(whole, 40.0).collect()
        }
        assert got == expect and len(got) > 0
