"""Example Airflow wiring for the engine's pipeline lifecycle (E4).

The reference orchestrates two DAGs (src/dags/flight_utilization.py:64-78):

- ``metadata_etl`` — daily, one task, retries=2 / 5 min delay
- ``adsb_etl`` — every 5 minutes, ``active_flights_report >>
  complete_flights_report``; active retries=2 / 30 s, complete
  retries=1 / 30 s

The engine deliberately keeps retries/schedules with the orchestrator
(pipeline.py docstring); this module closes the lifecycle-parity gap by
showing exactly how the reference's DAGs map onto :class:`FlightPipeline`
task bodies. Airflow is optional: the task bodies below are plain
callables, testable without it, and :func:`build_dags` raises a typed
error when airflow is absent.

Scale note: each task body builds (or reuses) a SparkSession and runs one
idempotent engine cycle. On a real cluster the task submits to YARN/K8s
via the ordinary spark-submit mechanisms; nothing here assumes local mode.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any

from pyspark.sql import SparkSession

from .errors import EngineError
from .pipeline import FlightPipeline
from .sources.rest import OpenSkyClient


class OrchestratorUnavailable(EngineError):
    """Airflow is not installed in this environment."""


@dataclass
class OrchestrationConfig:
    """Everything a task body needs to run one engine cycle."""

    state_root: str
    facts_path: str
    metadata_path: str
    aircraft_csv_path: str
    # injected for tests / alternate feeds; defaults hit the live API
    fetch_states: Callable[[], dict] | None = None
    spark_factory: Callable[[], SparkSession] = field(
        default=SparkSession.builder.getOrCreate
    )
    opensky_username: str | None = None
    opensky_password: str | None = None

    def pipeline(self, spark: SparkSession) -> FlightPipeline:
        return FlightPipeline(
            spark,
            state_root=self.state_root,
            facts_path=self.facts_path,
            metadata_path=self.metadata_path,
        )


def metadata_report(config: OrchestrationConfig) -> None:
    """Task body: EP3 daily dimension refresh (reference
    flight_utilization.py:20-30)."""
    spark = config.spark_factory()
    config.pipeline(spark).run_metadata_etl(config.aircraft_csv_path)


def active_flights_report(config: OrchestrationConfig) -> None:
    """Task body: EP1 poll + state merge (reference :33-45)."""
    spark = config.spark_factory()
    fetch = config.fetch_states or OpenSkyClient(
        config.opensky_username, config.opensky_password
    ).get_states
    config.pipeline(spark).run_active_flights(fetch())


def complete_flights_report(config: OrchestrationConfig) -> None:
    """Task body: EP2 classify + emit completed flights (reference
    :48-61)."""
    spark = config.spark_factory()
    config.pipeline(spark).run_complete_flights()


# (dag_id, schedule, [(task_body, retries, retry_delay_seconds), ...])
# — the reference's cadences and retry policy, verbatim (:20,33,48,64-78).
DAG_SPECS = [
    ("metadata_etl", timedelta(days=1), [(metadata_report, 2, 300)]),
    (
        "adsb_etl",
        timedelta(minutes=5),
        [(active_flights_report, 2, 30), (complete_flights_report, 1, 30)],
    ),
]


def build_dags(config: OrchestrationConfig) -> dict[str, Any]:
    """Materialize the two reference DAGs against a config.

    Returns {dag_id: DAG}; a DAG file does
    ``globals().update(build_dags(cfg))`` to register them. Tasks within
    a DAG are chained in spec order (active >> complete).
    """
    try:
        from airflow.decorators import task
        from airflow.models.dag import DAG
    except ImportError as e:
        raise OrchestratorUnavailable(
            "apache-airflow is not installed; the engine runs fine "
            "without it (use the CLI in __main__.py or call the task "
            "bodies directly) — install airflow to materialize the DAGs"
        ) from e

    dags: dict[str, Any] = {}
    for dag_id, schedule, tasks in DAG_SPECS:
        with DAG(
            dag_id=dag_id,
            start_date=datetime(2024, 1, 1),
            schedule=schedule,
            catchup=False,
        ) as dag:
            prev = None
            for body, retries, delay_s in tasks:
                wrapped = task(
                    task_id=body.__name__,
                    retries=retries,
                    retry_delay=timedelta(seconds=delay_s),
                )(lambda b=body: b(config))
                node = wrapped()
                if prev is not None:
                    prev >> node
                prev = node
        dags[dag_id] = dag
    return dags
