"""Orchestration (example Airflow DAGs) and optional Mongo sink adapter.

Both are optional-dependency surfaces: the modules must import and the
engine must run with neither airflow nor pymongo installed, failing only
when the optional path is actually invoked — with a typed, actionable
error. Structure (cadences, retries, task order) is pinned against the
reference DAG (src/dags/flight_utilization.py:20,33,48,64-78).
"""

from __future__ import annotations

import sys
import time
import types
from datetime import timedelta

import pytest

from aircraftutilization_etl_spark.orchestration import (
    DAG_SPECS,
    OrchestrationConfig,
    OrchestratorUnavailable,
    active_flights_report,
    build_dags,
    complete_flights_report,
    metadata_report,
)
from aircraftutilization_etl_spark.sources.mongo import (
    MongoSinkUnavailable,
    _partition_writer,
    ensure_timeseries_collection,
    write_facts_mongodb,
)

try:
    import airflow  # noqa: F401

    HAVE_AIRFLOW = True
except ImportError:
    HAVE_AIRFLOW = False

try:
    import pymongo  # noqa: F401

    HAVE_PYMONGO = True
except ImportError:
    HAVE_PYMONGO = False


class TestDagSpecs:
    def test_reference_cadences_and_retries(self):
        # flight_utilization.py:64-78 — daily metadata, 5-minute adsb
        specs = {dag_id: (sched, tasks) for dag_id, sched, tasks in DAG_SPECS}
        assert specs["metadata_etl"][0] == timedelta(days=1)
        assert specs["adsb_etl"][0] == timedelta(minutes=5)
        # E4 retry policy: metadata 2/5min (:20), active 2/30s (:33),
        # complete 1/30s (:48)
        assert [(b.__name__, r, d) for b, r, d in specs["metadata_etl"][1]] == [
            ("metadata_report", 2, 300)
        ]
        assert [(b.__name__, r, d) for b, r, d in specs["adsb_etl"][1]] == [
            ("active_flights_report", 2, 30),
            ("complete_flights_report", 1, 30),
        ]

    @pytest.mark.skipif(HAVE_AIRFLOW, reason="airflow installed")
    def test_build_dags_raises_typed_error_without_airflow(self, tmp_path):
        cfg = OrchestrationConfig(
            state_root=str(tmp_path / "s"),
            facts_path=str(tmp_path / "f"),
            metadata_path=str(tmp_path / "m"),
            aircraft_csv_path=str(tmp_path / "a.csv"),
        )
        with pytest.raises(OrchestratorUnavailable, match="airflow"):
            build_dags(cfg)

    @pytest.mark.skipif(not HAVE_AIRFLOW, reason="airflow not installed")
    def test_build_dags_structure(self, tmp_path):
        cfg = OrchestrationConfig(
            state_root=str(tmp_path / "s"),
            facts_path=str(tmp_path / "f"),
            metadata_path=str(tmp_path / "m"),
            aircraft_csv_path=str(tmp_path / "a.csv"),
        )
        dags = build_dags(cfg)
        assert set(dags) == {"metadata_etl", "adsb_etl"}
        adsb = dags["adsb_etl"]
        assert len(adsb.tasks) == 2


class TestTaskBodies:
    def _state_vector(self, icao, t, vel, vr):
        return [icao, "CS", "US", t, t, 1.0, 2.0, 100.0, False,
                vel, 10.0, vr, None, 120.0, None, False, 0]

    def test_full_cycle_through_task_bodies(self, spark, tmp_path):
        """metadata -> (active >> complete) x2 lands one fact, exactly as
        the reference DAG sequence would."""
        t0 = int(time.time()) - 600
        payloads = iter(
            [
                {"time": t0, "states": [self._state_vector("a1", t0, 120.0, 8.0)]},
                {
                    "time": t0 + 300,
                    "states": [self._state_vector("a1", t0 + 300, 0.0, 0.0)],
                },
            ]
        )
        meta_csv = tmp_path / "aircraft.csv"
        meta_csv.write_text(
            "icao24,manufacturericao,model,operator,owner,registration,"
            "serialnumber,built\n"
            "a1,AIRBUS,A320,OpCo,OwnCo,N123,SN1,2015-06-01\n"
        )
        cfg = OrchestrationConfig(
            state_root=str(tmp_path / "state"),
            facts_path=str(tmp_path / "facts"),
            metadata_path=str(tmp_path / "meta"),
            aircraft_csv_path=str(meta_csv),
            fetch_states=lambda: next(payloads),
            spark_factory=lambda: spark,
        )
        metadata_report(cfg)
        for _ in range(2):
            active_flights_report(cfg)
            complete_flights_report(cfg)
        facts = spark.read.parquet(cfg.facts_path)
        rows = facts.collect()
        assert len(rows) == 1
        assert rows[0]["icao24"] == "a1" and rows[0]["model"] == "A320"


class FakeCollection:
    def __init__(self):
        self.batches = []

    def insert_many(self, docs):
        self.batches.append(list(docs))


class FakeMongoModule(types.ModuleType):
    def __init__(self):
        super().__init__("pymongo")
        self.collection = FakeCollection()
        self.closed = False
        outer = self

        class _Client:
            def __init__(self, uri):
                self.uri = uri

            def __getitem__(self, db):
                return {"flights": outer.collection}

            def close(self):
                outer.closed = True

        self.MongoClient = _Client


class TestMongoAdapter:
    @pytest.mark.skipif(HAVE_PYMONGO, reason="pymongo installed")
    def test_pymongo_path_raises_typed_error(self, spark):
        df = spark.range(1).withColumnRenamed("id", "icao24")
        with pytest.raises(MongoSinkUnavailable, match="pymongo"):
            write_facts_mongodb(df, "mongodb://x", "db", via="pymongo")

    @pytest.mark.skipif(HAVE_PYMONGO, reason="pymongo installed")
    def test_ensure_collection_raises_typed_error(self):
        with pytest.raises(MongoSinkUnavailable, match="pymongo"):
            ensure_timeseries_collection(db=None)

    def test_connector_path_raises_typed_error_without_jar(self, spark):
        df = spark.range(1).withColumnRenamed("id", "icao24")
        with pytest.raises(MongoSinkUnavailable, match="connector"):
            write_facts_mongodb(df, "mongodb://x", "db", via="connector")

    def test_empty_batch_skipped(self, spark):
        df = spark.range(0).withColumnRenamed("id", "icao24")
        # returns False before touching any mongo dependency
        assert write_facts_mongodb(df, "mongodb://x", "db") is False

    def test_bad_via_rejected(self, spark):
        df = spark.range(1)
        with pytest.raises(ValueError, match="via"):
            write_facts_mongodb(df, "mongodb://x", "db", via="smoke-signal")

    def test_partition_writer_chunks_and_projects(self, monkeypatch):
        """The executor-side closure: field projection, insert_many
        chunking, client cleanup — driven with a fake pymongo."""
        fake = FakeMongoModule()
        monkeypatch.setitem(sys.modules, "pymongo", fake)
        writer = _partition_writer(
            "mongodb://x", "db", "flights",
            fields=["icao24", "landed_at"], batch_size=2,
        )
        rows = [
            {"icao24": f"a{i}", "landed_at": i, "extra": "dropped"}
            for i in range(5)
        ]
        writer(iter(rows))
        assert [len(b) for b in fake.collection.batches] == [2, 2, 1]
        assert fake.collection.batches[0][0] == {"icao24": "a0", "landed_at": 0}
        assert fake.closed
