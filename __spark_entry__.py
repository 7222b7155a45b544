"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries`` exposes every
implemented operator from SURVEY.md §2 (plus the scale surface: dedup,
similarity, text analysis, sessionization, as-of); ``oracle_sql`` gives
the DuckDB-equivalent SQL for each (queries with no SQL-expressible
oracle are omitted there and get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aircraftutilization_etl_spark.plans import CATALOG

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The curation funnel composes the engine's training-data operators
    (quality scoring, language gate, exact dedup, benchmark
    decontamination) in one oracle-matched plan — the best single
    demonstration of what this engine is for.
    """
    return CATALOG["q_curation_funnel"].spark(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.spark for name, qd in sorted(CATALOG.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same column names/types)."""
    return {
        name: qd.oracle for name, qd in sorted(CATALOG.items()) if qd.oracle
    }
