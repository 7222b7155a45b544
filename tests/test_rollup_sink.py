"""Replay-idempotent streaming rollup sink (streaming/rollup_sink.py).

Contract under test: (1) the streamed rollup equals the one-shot batch
GROUP BY over all data; (2) REPLAYING a micro-batch (the crash-between-
sink-and-checkpoint case foreachBatch must survive) changes nothing;
(3) compaction folds epochs without changing the merged result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aircraftutilization_etl_spark.streaming.rollup_sink import (
    RollupSpec,
    compact_rollup,
    read_rollup,
    start_rollup_sink,
    write_epoch_partial,
)

SPEC = RollupSpec(keys=["event_type"], sums=["cents"], mins=["cents"], maxs=["cents"])


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_type string, cents long")


def _expected(spark, all_rows):
    return {
        (r.event_type, r.n_rows, r.sum_cents, r.min_cents, r.max_cents)
        for r in _batch(spark, all_rows)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .collect()
    }


def _got(spark, path):
    return {
        tuple(r)
        for r in read_rollup(spark, path, SPEC)
        .select("event_type", "n_rows", "sum_cents", "min_cents", "max_cents")
        .collect()
    }


class TestEpochPartialSink:
    def test_matches_batch_groupby_and_replay_is_noop(self, spark, tmp_path):
        path = str(tmp_path / "rollup")
        b0 = [("click", 100), ("view", 50), ("click", 10)]
        b1 = [("click", 7), ("purchase", 900)]
        write_epoch_partial(_batch(spark, b0), 0, path, SPEC)
        write_epoch_partial(_batch(spark, b1), 1, path, SPEC)
        assert _got(spark, path) == _expected(spark, b0 + b1)
        # crash-replay of batch 1: same epoch overwritten -> no change
        write_epoch_partial(_batch(spark, b1), 1, path, SPEC)
        assert _got(spark, path) == _expected(spark, b0 + b1)

    def test_compaction_preserves_rollup(self, spark, tmp_path):
        path = str(tmp_path / "rollup")
        batches = [
            [("a", 1), ("b", 2)],
            [("a", 10)],
            [("c", -5), ("a", 3)],
        ]
        for i, rows in enumerate(batches):
            write_epoch_partial(_batch(spark, rows), i, path, SPEC)
        before = _got(spark, path)
        assert compact_rollup(spark, path, SPEC) == 3
        assert _got(spark, path) == before
        # post-compaction increments keep merging correctly
        write_epoch_partial(_batch(spark, [("b", 100)]), 3, path, SPEC)
        allrows = [r for b in batches for r in b] + [("b", 100)]
        assert _got(spark, path) == _expected(spark, allrows)
        # compacting again folds the new epoch into the base
        assert compact_rollup(spark, path, SPEC) == 1

    def test_streaming_end_to_end(self, spark, tmp_path):
        import json
        import os
        import time

        src = tmp_path / "src"
        src.mkdir()
        path = str(tmp_path / "rollup")
        ckpt = str(tmp_path / "ckpt")
        rows = [("click", 5), ("view", 9), ("click", 1)]
        with open(src / "b0.json", "w") as f:
            for t, c in rows:
                f.write(json.dumps({"event_type": t, "cents": c}) + "\n")
        stream = (
            spark.readStream.schema("event_type string, cents long")
            .json(str(src))
        )
        q = start_rollup_sink(stream, path, ckpt, SPEC)
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                q.processAllAvailable()
                if os.path.exists(path) and _got(spark, path) == _expected(
                    spark, rows
                ):
                    break
                time.sleep(0.5)
            assert _got(spark, path) == _expected(spark, rows)
        finally:
            q.stop()


class TestStreamingCountMin:
    """A count-min sketch is a (depth, col)-keyed count rollup, so the
    epoch-partial sink maintains it incrementally with replay safety —
    the streamed sketch must equal the one-shot batch sketch."""

    CMS_SPEC = RollupSpec(keys=["depth", "col"], count_col="cnt")

    def _keys(self, spark, ks):
        return spark.createDataFrame([(k,) for k in ks], "user_id long")

    def test_streamed_cells_equal_batch_sketch_and_replay_noop(
        self, spark, tmp_path
    ):
        from aircraftutilization_etl_spark.operators.frequency import (
            count_min_build,
            count_min_cells,
        )

        path = str(tmp_path / "cms")
        batches = [[1, 1, 2], [2, 3, 3, 3], [1, 4]]
        for i, ks in enumerate(batches):
            write_epoch_partial(
                count_min_cells(self._keys(spark, ks), "user_id"),
                i,
                path,
                self.CMS_SPEC,
            )
        # crash-replay of the middle batch: same epoch, same bytes
        write_epoch_partial(
            count_min_cells(self._keys(spark, batches[1]), "user_id"),
            1,
            path,
            self.CMS_SPEC,
        )
        streamed = {
            (r.depth, r.col, r.cnt)
            for r in read_rollup(spark, path, self.CMS_SPEC).collect()
        }
        whole = {
            (r.depth, r.col, r.cnt)
            for r in count_min_build(
                self._keys(spark, [k for b in batches for k in b]), "user_id"
            ).collect()
        }
        assert streamed == whole


SUM_SPEC = RollupSpec(keys=["event_type"], sums=["cents"])


class TestErasure:
    def _rows(self, spark, rows):
        return spark.createDataFrame(rows, "event_type string, cents long")

    def test_decrement_equals_recompute_over_survivors(
        self, spark, tmp_path
    ):
        from aircraftutilization_etl_spark.streaming.rollup_sink import (
            apply_erasure,
            read_rollup_live,
        )

        path = str(tmp_path / "rollup")
        b0 = [("click", 100), ("view", 50), ("click", 10)]
        b1 = [("click", 7), ("purchase", 900)]
        write_epoch_partial(self._rows(spark, b0), 0, path, SUM_SPEC)
        write_epoch_partial(self._rows(spark, b1), 1, path, SUM_SPEC)
        # erase one click row and the whole purchase group
        erased = [("click", 10), ("purchase", 900)]
        apply_erasure(self._rows(spark, erased), 0, path, SUM_SPEC)
        got = {
            tuple(r)
            for r in read_rollup_live(spark, path, SUM_SPEC)
            .select("event_type", "n_rows", "sum_cents")
            .collect()
        }
        assert got == {("click", 2, 107), ("view", 1, 50)}

    def test_erasure_replay_is_idempotent_and_compaction_folds(
        self, spark, tmp_path
    ):
        from aircraftutilization_etl_spark.streaming.rollup_sink import (
            apply_erasure,
            read_rollup_live,
        )

        path = str(tmp_path / "rollup")
        write_epoch_partial(
            self._rows(spark, [("click", 100), ("view", 50)]), 0, path,
            SUM_SPEC,
        )
        erased = self._rows(spark, [("view", 50)])
        apply_erasure(erased, 0, path, SUM_SPEC)
        apply_erasure(erased, 0, path, SUM_SPEC)  # replayed request
        got = {
            tuple(r)
            for r in read_rollup_live(spark, path, SUM_SPEC)
            .select("event_type", "n_rows", "sum_cents")
            .collect()
        }
        assert got == {("click", 1, 100)}
        # compaction folds the erasure epoch; the erased group is gone
        # from the base partial itself, not just filtered at read time
        assert compact_rollup(spark, path, SUM_SPEC) >= 1
        assert {
            tuple(r)
            for r in read_rollup_live(spark, path, SUM_SPEC)
            .select("event_type", "n_rows", "sum_cents")
            .collect()
        } == {("click", 1, 100)}
        # replaying the SAME erasure id AFTER compaction must be a
        # no-op (the folded epoch is gone; the ledger marker is not)
        apply_erasure(erased, 0, path, SUM_SPEC)
        assert {
            tuple(r)
            for r in read_rollup_live(spark, path, SUM_SPEC)
            .select("event_type", "n_rows", "sum_cents")
            .collect()
        } == {("click", 1, 100)}

    def test_compaction_stamps_ledger_for_unmarked_erasure_epochs(
        self, spark, tmp_path
    ):
        """Crash window: an erasure epoch written without its marker
        (crash between the two writes) must still be recorded by the
        compaction that folds it, so a later replay cannot double-apply."""
        from aircraftutilization_etl_spark.streaming.rollup_sink import (
            ERASURE_EPOCH_BASE,
            _erasure_marker,
            apply_erasure,
            read_rollup_live,
        )

        path = str(tmp_path / "rollup")
        write_epoch_partial(
            self._rows(spark, [("click", 100), ("view", 50)]), 0, path,
            SUM_SPEC,
        )
        # simulate the crash: epoch written, marker missing
        neg = self._rows(spark, [("view", -50)]).selectExpr(
            "event_type", "CAST(-1 AS BIGINT) AS n_rows",
            "CAST(cents AS BIGINT) AS sum_cents",
        )
        neg.write.mode("overwrite").parquet(
            f"{path}/epoch={ERASURE_EPOCH_BASE - 0}"
        )
        import os

        assert not os.path.exists(_erasure_marker(path, 0))
        assert compact_rollup(spark, path, SUM_SPEC) >= 1
        assert os.path.exists(_erasure_marker(path, 0))
        # the replayed request is now a no-op
        apply_erasure(self._rows(spark, [("view", 50)]), 0, path, SUM_SPEC)
        assert {
            tuple(r)
            for r in read_rollup_live(spark, path, SUM_SPEC)
            .select("event_type", "n_rows", "sum_cents")
            .collect()
        } == {("click", 1, 100)}

    def test_rejects_non_subtractable_spec(self, spark, tmp_path):
        from aircraftutilization_etl_spark.streaming.rollup_sink import (
            apply_erasure,
        )

        with pytest.raises(ValueError, match="subtractable"):
            apply_erasure(
                self._rows(spark, [("click", 1)]), 0,
                str(tmp_path / "r"), SPEC,
            )
