"""Migration-command tests (reference src/commands parity, S7)."""

from __future__ import annotations

import datetime as dt

from aircraftutilization_etl_spark.commands import (
    add_metadata,
    built_string_to_dt,
    run_add_metadata_migration,
    run_built_string_migration,
)

META = (
    "icao24 string, registration string, model string, manufacturer_icao string,"
    " owner string, operator string, built string"
)


def test_add_metadata_left_join_and_overwrite(spark):
    facts = spark.createDataFrame(
        [("abc", 10, "OLD_MODEL"), ("zzz", 20, None)],
        "icao24 string, flight_duration_minutes int, model string",
    )
    metadata = spark.createDataFrame(
        [("abc", "N1", "A320", "AIRBUS", "own", "op", "2015-06-01")], META
    )
    out = {r["icao24"]: r for r in add_metadata(facts, metadata).collect()}
    assert out["abc"]["model"] == "A320"  # replaced, not kept
    assert out["zzz"]["model"] is None  # left join keeps unmatched facts
    assert out["abc"]["flight_duration_minutes"] == 10


def test_built_string_parse_strict(spark):
    facts = spark.createDataFrame(
        [("a", "2016-03-02"), ("b", "not-a-date"), ("c", None)],
        "icao24 string, built string",
    )
    out = {r["icao24"]: r["built"] for r in built_string_to_dt(facts).collect()}
    assert out["a"] == dt.datetime(2016, 3, 2)
    assert out["b"] is None  # unparseable -> null (reference :69-75)
    assert out["c"] is None


def test_end_to_end_migrations(spark, tmp_path):
    facts_path = str(tmp_path / "facts")
    meta_path = str(tmp_path / "meta")
    spark.createDataFrame(
        [("abc", 31), ("def", 7)], "icao24 string, flight_duration_minutes int"
    ).write.parquet(facts_path)
    spark.createDataFrame(
        [("abc", "N1", "A320", "AIRBUS", "own", "op", "2015-06-01")], META
    ).write.parquet(meta_path)

    n = run_add_metadata_migration(
        spark, facts_path, meta_path, str(tmp_path / "enriched")
    )
    assert n == 2
    n = run_built_string_migration(
        spark, str(tmp_path / "enriched"), str(tmp_path / "final")
    )
    assert n == 2
    final = {r["icao24"]: r for r in
             spark.read.parquet(str(tmp_path / "final")).collect()}
    assert final["abc"]["built"] == dt.datetime(2015, 6, 1)
    assert final["def"]["built"] is None
