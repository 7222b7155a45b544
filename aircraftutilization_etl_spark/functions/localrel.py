"""Driver-side small frames as inline-``VALUES`` LocalRelations.

``spark.createDataFrame(list_of_rows)`` wraps the rows in a pickled
Python RDD whose DataFrame conversion launches ``defaultParallelism``
Python-worker tasks — measured ~0.2-0.3 s of wall per call at local[32]
for model-sized frames (allocation tables, query term lists, spec
frames), pure overhead the query's data never needed (optimization
guide §4: keep model-sized data off the Python boundary; §5: the driver
should do almost no data work). An inline ``VALUES`` statement parses
to a LocalRelation that broadcast/join consumers read driver-side with
ZERO jobs and zero Python workers, and the explicit ``CAST`` per column
reproduces the requested schema exactly.

Only types with an exact SQL literal rendering are accepted (int, str,
bool, None); anything else falls back to ``createDataFrame`` — callers
keep identical semantics either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise TypeError(f"no exact SQL literal rendering for {type(v)}")


def inline_values_df(
    spark: SparkSession, rows, schema_ddl: str
) -> DataFrame:
    """Rows (sequence of tuples) + DDL schema → DataFrame, as a parsed
    LocalRelation when every value is int/str/bool/None, else via the
    classic ``createDataFrame`` path (identical output either way)."""
    rows = list(rows)
    if not rows:
        # empty list: createDataFrame builds an empty LocalRelation
        # without any job — nothing to optimize
        return spark.createDataFrame([], schema_ddl)
    # an empty createDataFrame is job-free and resolves the DDL exactly
    # as the fallback path would — reuse it as the schema parser
    fields = spark.createDataFrame([], schema_ddl).schema.fields
    try:
        vals = ",".join(
            "(" + ",".join(_render(v) for v in r) + ")" for r in rows
        )
    except TypeError:
        return spark.createDataFrame(rows, schema_ddl)
    cols = ",".join(
        f"CAST(col{i + 1} AS {f.dataType.simpleString()}) "
        "AS `" + f.name.replace("`", "``") + "`"
        for i, f in enumerate(fields)
    )
    return spark.sql(f"SELECT {cols} FROM VALUES {vals}")
