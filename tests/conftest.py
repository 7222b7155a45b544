import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="spark-warehouse-")
    session = (
        SparkSession.builder.master("local[4]")
        .appName("aircraftutilization-etl-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.warehouse.dir", warehouse)
        .getOrCreate()
    )
    yield session
    session.stop()


def rows_sorted(df, *keys):
    """Canonicalized rows for order-insensitive comparison (SURVEY.md §4.4.4)."""
    return sorted(
        (tuple(row) for row in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    ) if not keys else [tuple(r) for r in df.orderBy(*keys).collect()]
