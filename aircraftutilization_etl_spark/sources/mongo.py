"""Optional MongoDB time-series sink — operational parity adapter.

The reference writes completed flights into a Mongo time-series
collection (src/plugins/scripts/complete_flights/db.py:42-79):
timeField=landed_at, metaField=icao24, "hours" granularity, 365-day
expireAfterSeconds, appended with insert_many, empty batches logged and
skipped. The engine's native sink is date-partitioned parquet
(sources/sinks.py) — this module is the drop-in adapter for deployments
that need the actual Mongo collection.

Two executor-side paths, both optional (neither pymongo nor the
mongo-spark connector jar ship with the engine):

1. ``write_facts_mongodb(..., via="connector")`` — the mongo-spark
   connector (``format("mongodb")``). The connector writes from every
   executor in parallel; at 100 TB this is the only sane path, and the
   collection/TTL must be pre-created (the connector does not pass
   time-series create options).
2. ``via="pymongo"`` — ``foreachPartition`` + per-partition
   ``insert_many``. Still executor-side (each partition opens its own
   short-lived client; nothing is collected to the driver), suitable for
   modest fact volumes where installing the connector jar is not worth
   it.

Import-safe: pymongo is imported lazily inside the functions, so merely
importing this module (or the package) never requires it.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

from ..errors import EngineError

logger = logging.getLogger(__name__)

FLIGHTS_EXPIRATION_SECONDS = 60 * 60 * 24 * 365  # reference db.py:43


class MongoSinkUnavailable(EngineError):
    """The requested Mongo write path is not installed in this env."""


def ensure_timeseries_collection(
    db,
    name: str = "flights",
    time_field: str = "landed_at",
    meta_field: str = "icao24",
    granularity: str = "hours",
    expire_after_seconds: int = FLIGHTS_EXPIRATION_SECONDS,
):
    """Create the reference's time-series collection if absent.

    Mirrors db.py:42-57: create_collection with the time-series options;
    an already-existing collection (CollectionInvalid) is reused as-is.
    ``db`` is a pymongo Database handle.
    """
    try:
        from pymongo.errors import CollectionInvalid
    except ImportError as e:  # pragma: no cover - env without pymongo
        raise MongoSinkUnavailable(
            "pymongo is not installed; pip install pymongo to use the "
            "Mongo sink adapter"
        ) from e
    try:
        return db.create_collection(
            name=name,
            timeseries={
                "timeField": time_field,
                "metaField": meta_field,
                "granularity": granularity,
            },
            expireAfterSeconds=expire_after_seconds,
        )
    except CollectionInvalid as e:
        logger.debug(e)
        return db[name]


def write_facts_mongodb(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str = "flights",
    via: str = "connector",
    batch_size: int = 1000,
) -> bool:
    """Append completed-flight facts to a Mongo time-series collection.

    Returns False and logs on an empty batch instead of writing
    (reference db.py:76-79 insert-or-log). Raises
    :class:`MongoSinkUnavailable` with an actionable message when the
    chosen path's dependency is absent.
    """
    if df.isEmpty():
        logger.info("Empty document. Nothing to write")
        return False
    if via == "connector":
        try:
            (
                df.write.format("mongodb")
                .mode("append")
                .option("connection.uri", uri)
                .option("database", database)
                .option("collection", collection)
                .save()
            )
            return True
        except Exception as e:  # connector jar missing -> typed error
            if "Failed to find" in str(e) or "ClassNotFound" in str(e):
                raise MongoSinkUnavailable(
                    "mongo-spark connector not on the Spark classpath; "
                    "add org.mongodb.spark:mongo-spark-connector via "
                    "spark.jars.packages, or use via='pymongo'"
                ) from e
            raise
    if via != "pymongo":
        raise ValueError(f"via must be 'connector' or 'pymongo', got {via!r}")

    try:
        import pymongo  # noqa: F401
    except ImportError as e:
        raise MongoSinkUnavailable(
            "pymongo is not installed; pip install pymongo to use "
            "via='pymongo'"
        ) from e

    writer = _partition_writer(uri, database, collection, df.columns, batch_size)
    df.foreachPartition(writer)
    return True


def _partition_writer(uri, database, collection, fields, batch_size):
    """Build the executor-side partition writer: one short-lived client
    per partition, chunked insert_many — no driver materialization."""

    def _write_partition(rows):
        import pymongo as _pm

        client = _pm.MongoClient(uri)
        try:
            coll = client[database][collection]
            chunk = []
            for row in rows:
                chunk.append({f: row[f] for f in fields})
                if len(chunk) >= batch_size:
                    coll.insert_many(chunk)
                    chunk = []
            if chunk:
                coll.insert_many(chunk)
        finally:
            client.close()

    return _write_partition
