"""Catalog queries for the single-pass column profiler
(operators/profile.py) — dataset-card statistics.

``q_profile_lineitem`` is the exact profile, hash-checked against a
UNION ALL of per-column DuckDB aggregates. ``q_profile_lineitem_approx``
is the same operator with HLL++ distinct counts — the 100 TB path (no
Expand row multiplication) — and gets the rows-only check, mirroring the
exact/approx percentile twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import profile_columns
from .catalog import query, table

_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")


def _oracle_block(col: str) -> str:
    return f"""
    SELECT '{col}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST(MIN({col}) AS VARCHAR) AS min_value,
           CAST(MAX({col}) AS VARCHAR) AS max_value
    FROM lineitem
    """


@query(
    "q_profile_lineitem",
    " UNION ALL ".join(_oracle_block(c) for c in _COLS)
    + " ORDER BY col_name",
)
def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact single-pass profile of four lineitem columns: row count,
    nulls, distinct count, min/max (native-type ordering, stringified at
    the edge). The oracle recomputes each column independently; matching
    proves the fused one-scan plan computes the same statistics.

    Scale note: exact multi-column COUNT(DISTINCT) makes Spark plan an
    Expand (|columns|x row multiplication) — acceptable for audits; the
    approx twin below is the routine-profiling path.
    """
    li = table(spark, sf_dir, "lineitem")
    return profile_columns(li, _COLS, exact=True).orderBy("col_name")


@query("q_profile_lineitem_approx", None)
def q_profile_lineitem_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same profile with HLL++ distinct counts (rows-only check: sketch
    estimates aren't SQL-replayable). One scan, one ordinary
    hash-aggregate, no Expand — the shape that profiles a 100 TB table
    in a single pass. Estimate accuracy vs exact is pinned in
    tests/test_profile.py.
    """
    li = table(spark, sf_dir, "lineitem")
    return profile_columns(li, _COLS, exact=False).orderBy("col_name")
