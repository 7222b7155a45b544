"""Query catalog — the engine's public query surface.

Every operator claimed in SURVEY.md §2 (and the scale surface beyond it)
is exposed as a named query over the driver's synthetic tables, paired
with an ANSI-SQL oracle that DuckDB runs on the same parquet files
(TESTDATA.md). The driver compares row counts, schemas and
order-insensitive value hashes — so every computed column is aliased
identically on both sides, doubles are rounded at the output edge, and
integer-typed aggregates are cast to BIGINT in the oracle (DuckDB's
SUM(int) is HUGEINT).

Queries with no SQL-expressible oracle (oracle=None) get the driver's
weaker rows-only check and say so in their docstring.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


CATALOG: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None):
    """Register a (spark_fn, oracle_sql) pair under ``name``.

    The registered callable bootstraps the session confs the catalog's
    reads rely on (``ensure_runtime_confs`` — idempotent, applied
    uniformly at the API boundary rather than as a per-query side
    effect) before delegating to the query body.
    """

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        import functools

        from ..session import ensure_runtime_confs

        @functools.wraps(fn)
        def bootstrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        CATALOG[name] = QueryDef(
            name=name, spark=bootstrapped, oracle=oracle, doc=fn.__doc__ or ""
        )
        return fn

    return wrap


# Parquet-schema memo (r12, guide §5 — the driver should do almost no
# work): schema INFERENCE is a fresh driver-side footer read per
# ``spark.read.parquet`` call (~85 ms measured; the catalog issues
# hundreds of table() calls per bench run, all inside the timed
# plan-build region). The schema of a fixed file set is immutable
# metadata, so it is memoized per (path, size, mtime_ns) stat
# fingerprint and replayed through ``spark.read.schema(...)`` (~16 ms).
# Every call still returns a FRESH DataFrame with fresh expression ids
# (self-joins between two table() reads keep working exactly as
# before), every scan still reads the parquet files — this caches
# metadata, never data or results. A rewritten/regenerated table under
# the same path moves the fingerprint and re-infers.
_SCHEMA_MEMO: dict[tuple, object] = {}


def _stat_fingerprint(path: str) -> tuple:
    """(path, size, mtime_ns) per data file under a parquet path (single
    file or part-file dir) — changes whenever the table is rewritten."""
    paths = [path]
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, p)
            for p in os.listdir(path)
            if not p.startswith((".", "_"))
        )
    out = []
    for p in paths:
        try:
            st = os.stat(p)
            out.append((p, st.st_size, st.st_mtime_ns))
        except OSError:
            out.append((p, -1, -1))
    return tuple(out)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    key = _stat_fingerprint(path)
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema'd scan of one synthetic table (never infers beyond parquet
    footer metadata — and only once per file fingerprint, see
    ``_SCHEMA_MEMO``; Catalyst prunes columns/filters into the scan).

    ``events.ts`` is normalized to the engine's µs TimestampType
    whatever the generator wrote: TIMESTAMP(NANOS) parquet arrives as a
    nanos long (with ``nanosAsLong`` from session.RECOMMENDED) and is
    truncated to µs exactly as DuckDB does; TIMESTAMP_NTZ is a
    wall-clock-identical cast under the engine's UTC session timezone.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = _read_parquet(spark, path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif not isinstance(ts_type, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return _read_parquet(spark, path)
