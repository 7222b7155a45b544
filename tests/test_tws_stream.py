"""transformWithState session kernel: equivalence with the
applyInPandasWithState kernel on identical micro-batch replays.

transformWithState requires the RocksDB state store provider (the test
sets it for the duration of the streaming queries) and the ``protobuf``
package (Spark's state-server wire protocol,
pyspark/sql/streaming/proto) — skipped when protobuf is absent, the
same gate-if-unavailable policy as the Mongo adapter tests. The kernel
logic itself (fold_events) is fully covered by tests/test_streaming.py
either way.
"""

from __future__ import annotations

import importlib.util
import os

import pandas as pd
import pytest

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("google") is None
    or importlib.util.find_spec("google.protobuf") is None,
    reason="transformWithState needs protobuf (not in this environment)",
)

from aircraftutilization_etl_spark.streaming.flight_stream import (
    completed_flights_stream,
    completed_flights_stream_tws,
)

T0 = 1712338215

BATCHES = [
    # a1: takeoff -> cruise -> descend -> landing; b2: no takeoff, stops
    [("a1", T0, 120.0, 8.0), ("b2", T0, 100.0, 0.0)],
    [("a1", T0 + 600, 200.0, 0.5)],
    [("a1", T0 + 1200, 150.0, -5.0), ("b2", T0 + 1200, 0.0, 0.0)],
    [("a1", T0 + 1800, 5.0, 0.0)],
]


def _write_batches(tmp_path):
    input_dir = tmp_path / "stream_in"
    input_dir.mkdir(parents=True)
    for i, batch in enumerate(BATCHES):
        pdf = pd.DataFrame(
            batch,
            columns=["icao24", "last_contact", "velocity", "vertical_rate"],
        )
        path = input_dir / f"batch_{i}.parquet"
        pdf.to_parquet(path)
        os.utime(path, (T0 + i, T0 + i))
    return input_dir


def _run(spark, tmp_path, kernel, out_name):
    states_stream = (
        spark.readStream.schema(
            "icao24 string, last_contact long, velocity double, "
            "vertical_rate double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(_write_batches(tmp_path)))
    )
    completed = kernel(states_stream)
    query = (
        completed.writeStream.format("parquet")
        .option("path", str(tmp_path / out_name))
        .option("checkpointLocation", str(tmp_path / f"ckpt_{out_name}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # NOT awaitTermination/processAllAvailable: a stateful availableNow
    # query with pending ProcessingTimeTimeout state keeps running
    # no-data batches until the TTL fires, so it cannot be awaited at
    # test scale in general (this fixture happens to clear all state —
    # b2's stop at T0+1200 is a silent landing — but the shared
    # protocol stays robust either way: it polls the sink for the
    # expected single flight, holds an over-emission grace window that
    # exits early when the query self-terminates, then stops).
    from stream_poll import poll_stream_sink

    schema = "icao24 string, flight_duration_minutes int, landed_at timestamp"

    def _read():
        try:
            return (
                spark.read.schema(schema)
                .parquet(str(tmp_path / out_name))
                .collect()
            )
        except Exception:
            return []

    return poll_stream_sink(query, _read, expected_rows=1)


@pytest.mark.slow
def test_tws_kernel_matches_apply_in_pandas_kernel(spark, tmp_path):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got_tws = _run(
            spark, tmp_path / "tws", completed_flights_stream_tws, "out"
        )
        got_aip = _run(
            spark, tmp_path / "aip", completed_flights_stream, "out"
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert got_tws == got_aip
    assert len(got_tws) == 1  # exactly a1's flight
    icao, duration, _landed = got_tws[0]
    assert icao == "a1" and duration == 30
