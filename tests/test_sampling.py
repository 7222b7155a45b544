"""Deterministic sampling/split operators (operators/sampling.py).

The contract under test is REPRODUCIBILITY: selections must be a pure
function of row keys — identical across reruns, partitionings and
engines — plus exact per-stratum counts and split disjointness.
"""

from __future__ import annotations

import pytest

from aircraftutilization_etl_spark.operators.sampling import (
    hash_bucket,
    hash_split,
    split_thresholds,
    stratified_sample,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def people(spark):
    return spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
    )


class TestSplitThresholds:
    def test_cumulative_hex_bounds(self):
        got = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
        assert got == [("train", "cccd"), ("val", "e666"), ("test", "g")]

    def test_rejects_non_unit_sum(self):
        with pytest.raises(ValueError, match="sum to 1"):
            split_thresholds({"a": 0.5, "b": 0.4})

    def test_full_range_bound_sorts_above_hex(self):
        # 'g' > 'ffff' lexicographically, so the last range is total
        assert "g" > "ffff"


class TestHashSplit:
    def test_partition_of_rows(self, people):
        out = hash_split(people, "id", {"train": 0.8, "val": 0.2})
        counts = dict(
            out.groupBy("split").count().rdd.map(tuple).collect()
        )
        assert sum(counts.values()) == 1000  # total partition, no loss
        # binomial(1000, .8): 3 sigma ~ 38
        assert 760 <= counts["train"] <= 840

    def test_stable_under_repartition(self, people):
        a = hash_split(people, "id", {"train": 0.8, "val": 0.2})
        b = hash_split(
            people.repartition(13, "grp"), "id", {"train": 0.8, "val": 0.2}
        )
        rows_a = sorted(map(tuple, a.select("id", "split").collect()))
        rows_b = sorted(map(tuple, b.select("id", "split").collect()))
        assert rows_a == rows_b

    def test_stable_under_append(self, people, spark):
        # rows present before an append keep their split afterwards
        first = hash_split(
            people.filter(F.col("id") < 500), "id", {"t": 0.5, "v": 0.5}
        )
        both = hash_split(people, "id", {"t": 0.5, "v": 0.5})
        sub = both.filter(F.col("id") < 500)
        assert sorted(map(tuple, first.collect())) == sorted(
            map(tuple, sub.collect())
        )

    def test_no_shuffle_in_plan(self, people):
        plan = hash_split(
            people, "id", {"t": 0.5, "v": 0.5}
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # narrow projection


class TestHashBucket:
    def test_matches_prefix_ordering(self, spark):
        df = spark.range(200).select(
            hash_bucket(F.col("id")).alias("b"),
            F.substring(F.md5(F.col("id").cast("string")), 1, 4).alias("p"),
        )
        rows = df.collect()
        for r in rows:
            assert r["b"] == int(r["p"], 16)


class TestStratifiedSample:
    def test_exact_counts_per_stratum(self, people):
        out = stratified_sample(people, ["grp"], 10, "id")
        counts = dict(
            out.groupBy("grp").count().rdd.map(tuple).collect()
        )
        assert set(counts.values()) == {10} and len(counts) == 7

    def test_caps_at_stratum_size(self, spark):
        small = spark.range(5).select(F.col("id"), F.lit(0).alias("grp"))
        out = stratified_sample(small, ["grp"], 10, "id")
        assert out.count() == 5

    def test_deterministic_membership(self, people):
        a = stratified_sample(people, ["grp"], 10, "id").collect()
        b = stratified_sample(
            people.repartition(17), ["grp"], 10, "id"
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_single_shuffle_plan(self, people):
        plan = stratified_sample(
            people, ["grp"], 10, "id"
        )._jdf.queryExecution().executedPlan().toString()
        # one exchange for the window partition; range(...) has no scan
        # exchange, so exactly one Exchange node total
        assert plan.count("Exchange") == 1


class TestRebalance:
    def test_quota_math_and_placement(self, spark):
        from pyspark.sql import functions as F

        from aircraftutilization_etl_spark.operators.sampling import (
            rebalance_sources,
        )

        rows = [(i, "a" if i < 40 else "b") for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        # weights 1:3 → T = min(40e6/250000, 60e6/750000) = min(160, 80) = 80
        # k_a = 250000*80//1e6 = 20, k_b = 750000*80//1e6 = 60
        weight = F.when(F.col("source") == "a", 250000).otherwise(750000)
        got = rebalance_sources(df, weight).collect()
        by_src = {}
        for r in got:
            by_src.setdefault(r["source"], set()).add(r["doc_id"])
        assert len(by_src["a"]) == 20 and len(by_src["b"]) == 60
        # deterministic under repartitioning
        again = rebalance_sources(df.repartition(7), weight).collect()
        assert {(r["doc_id"], r["source"]) for r in again} == {
            (r["doc_id"], r["source"]) for r in got
        }


class TestNovelty:
    def test_first_doc_is_fully_novel(self, spark):
        from aircraftutilization_etl_spark.operators.dedup import novelty_scores

        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),
                (2, "alpha beta gamma epsilon"),  # borrows 1 of its 2 shingles
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r for r in novelty_scores(df).collect()}
        assert got[1]["novel_ppm"] == 1_000_000
        assert got[2]["n_shingles"] == 2
        assert got[2]["n_novel"] == 1
        assert got[2]["novel_ppm"] == 500_000


def test_global_running_sum_matches_naive_window(spark):
    """The two-phase range-partitioned cumsum must equal the
    single-partition global window exactly, wherever the sampled range
    boundaries fall."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from aircraftutilization_etl_spark.operators.sampling import (
        global_running_sum,
    )

    rows = [(i, (i * 37) % 101, ((i * 13) % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, score long, w long")
    order = [F.desc("score"), F.asc("id")]

    naive = df.withColumn(
        "running_sum",
        F.sum("w").over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    fast = global_running_sum(df, order, "w", n_partitions=7)
    key = lambda r: (r["id"],)  # noqa: E731
    got = {r["id"]: r["running_sum"] for r in fast.collect()}
    want = {r["id"]: r["running_sum"] for r in naive.collect()}
    assert got == want


class TestTemperatureRebalance:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # 600 'en', 100 'de', 50 'fr' — a head-heavy domain mix
        return spark.range(750).select(
            F.col("id"),
            F.when(F.col("id") < 600, "en")
            .when(F.col("id") < 700, "de")
            .otherwise("fr")
            .alias("lang"),
        )

    def test_no_upsampling_and_target_cap(self, skewed):
        from aircraftutilization_etl_spark.operators.sampling import (
            temperature_rebalance,
        )

        out = temperature_rebalance(skewed, "lang", "id", 400)
        kept = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        raw = {
            r["lang"]: r["n"]
            for r in skewed.groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert sum(kept.values()) <= 400
        for lang, n in kept.items():
            assert n <= raw[lang]

    def test_flattens_head_share(self, skewed):
        from aircraftutilization_etl_spark.operators.sampling import (
            temperature_rebalance,
        )

        out = temperature_rebalance(skewed, "lang", "id", 400)
        kept = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        total = sum(kept.values())
        # raw head share is 80%; sqrt-flattened share must sit strictly
        # between uniform (1/3) and raw
        head = kept["en"] / total
        assert 1 / 3 < head < 0.8
        # and the tail is boosted relative to its raw 50/750 ≈ 6.7%
        assert kept["fr"] / total > 50 / 750

    def test_deterministic_across_partitionings(self, skewed):
        from aircraftutilization_etl_spark.operators.sampling import (
            temperature_rebalance,
        )

        a = {
            r["id"]
            for r in temperature_rebalance(skewed, "lang", "id", 400)
            .select("id")
            .collect()
        }
        b = {
            r["id"]
            for r in temperature_rebalance(
                skewed.repartition(13), "lang", "id", 400
            )
            .select("id")
            .collect()
        }
        assert a == b

    def test_quota_arithmetic_matches_model(self, skewed):
        """Replay the integer quota model in Python and compare."""
        import math

        from aircraftutilization_etl_spark.operators.sampling import (
            temperature_rebalance,
        )

        raw = {"en": 600, "de": 100, "fr": 50}
        s = {d: math.floor(math.sqrt(n) * 1_000_000) for d, n in raw.items()}
        big_s = sum(s.values())
        cap = min(min(n * big_s // s[d] for d, n in raw.items()), 400)
        expect = {d: s[d] * cap // big_s for d in raw}
        out = temperature_rebalance(skewed, "lang", "id", 400)
        kept = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert kept == {d: k for d, k in expect.items() if k > 0}


class TestKfoldAssign:
    def test_every_row_in_range_and_stable(self, people):
        from aircraftutilization_etl_spark.operators.sampling import (
            kfold_assign,
        )

        out = kfold_assign(people, "id", 5)
        folds = out.select("fold").distinct().collect()
        assert {r["fold"] for r in folds} <= set(range(5))
        # stability: fold is a pure function of the key
        again = kfold_assign(people.repartition(17), "id", 5)
        joined = (
            out.alias("a")
            .join(again.alias("b"), "id")
            .filter(F.col("a.fold") != F.col("b.fold"))
        )
        assert joined.count() == 0

    def test_roughly_uniform(self, people):
        from aircraftutilization_etl_spark.operators.sampling import (
            kfold_assign,
        )

        sizes = [
            r["n"]
            for r in kfold_assign(people, "id", 5)
            .groupBy("fold")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        assert len(sizes) == 5
        assert max(sizes) - min(sizes) < 1000 * 0.15

    def test_no_shuffle_in_plan(self, people):
        from aircraftutilization_etl_spark.operators.sampling import (
            kfold_assign,
        )

        plan = kfold_assign(people, "id", 5)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestShardAndOrder:
    def test_permutation_contract(self, people):
        from aircraftutilization_etl_spark.operators.sampling import shard_and_order

        out = shard_and_order(people, "id", 8, seed="s1").collect()
        assert sorted(r.id for r in out) == list(range(1000))
        by_shard: dict[int, list[int]] = {}
        for r in out:
            assert 0 <= r.shard < 8
            by_shard.setdefault(r.shard, []).append(r.pos)
        for positions in by_shard.values():
            assert sorted(positions) == list(range(1, len(positions) + 1))

    def test_seed_reshuffles_but_same_seed_replays(self, people):
        from aircraftutilization_etl_spark.operators.sampling import shard_and_order

        a = {(r.id, r.shard, r.pos) for r in shard_and_order(people, "id", 8, "a").collect()}
        a2 = {(r.id, r.shard, r.pos) for r in shard_and_order(people, "id", 8, "a").collect()}
        b = {(r.id, r.shard, r.pos) for r in shard_and_order(people, "id", 8, "b").collect()}
        assert a == a2
        assert a != b

    def test_partitioning_invariant(self, people):
        from aircraftutilization_etl_spark.operators.sampling import shard_and_order

        a = {(r.id, r.shard, r.pos) for r in shard_and_order(people, "id", 8, "s").collect()}
        b = {
            (r.id, r.shard, r.pos)
            for r in shard_and_order(people.repartition(13), "id", 8, "s").collect()
        }
        assert a == b

    def test_shards_roughly_balanced(self, people):
        from aircraftutilization_etl_spark.operators.sampling import shard_and_order

        sizes = (
            shard_and_order(people, "id", 8, "s")
            .groupBy("shard")
            .count()
            .collect()
        )
        assert len(sizes) == 8
        assert all(80 <= r["count"] <= 175 for r in sizes)


class TestMixEpochs:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        )

    def test_integer_exact_totals(self, docs):
        from aircraftutilization_etl_spark.operators.sampling import mix_epochs

        # 100 docs per source; 2.5x -> 250, 0.3x -> 30, 1.0x -> 100
        spec = {"s0": 2_500_000, "s1": 300_000, "s2": 1_000_000}
        out = mix_epochs(docs, spec).groupBy("source").count().collect()
        got = {r.source: r["count"] for r in out}
        assert got == {"s0": 250, "s1": 30, "s2": 100}

    def test_epoch_idx_shape(self, docs):
        from aircraftutilization_etl_spark.operators.sampling import mix_epochs

        out = mix_epochs(docs, {"s0": 2_500_000, "s1": 300_000, "s2": 1_000_000})
        rows = out.groupBy("source", "epoch_idx").count().collect()
        got = {(r.source, r.epoch_idx): r["count"] for r in rows}
        # s0: epochs 0,1 full (100 each) + 50 in epoch 2; s1: 30 in epoch 0
        assert got[("s0", 0)] == 100 and got[("s0", 1)] == 100 and got[("s0", 2)] == 50
        assert got[("s1", 0)] == 30
        assert ("s1", 1) not in got
        assert got[("s2", 0)] == 100

    def test_extra_copies_follow_md5_order(self, docs):
        from aircraftutilization_etl_spark.operators.sampling import mix_epochs

        out = mix_epochs(docs, {"s0": 1_500_000, "s1": 1_000_000, "s2": 1_000_000})
        doubled = {
            r.doc_id
            for r in out.filter("source = 's0' AND epoch_idx = 1").collect()
        }
        ranked = sorted(
            (r.doc_id for r in docs.filter("source = 's0'").collect()),
            key=lambda d: (__import__("hashlib").md5(str(d).encode()).hexdigest(), d),
        )
        assert doubled == set(ranked[:50])

    def test_unlisted_sources_dropped(self, docs):
        from aircraftutilization_etl_spark.operators.sampling import mix_epochs

        out = mix_epochs(docs, {"s0": 1_000_000})
        assert out.select("source").distinct().collect()[0].source == "s0"


class TestWeightedSample:
    """Efraimidis–Spirtakis weighted sampling: exact key replay, weight
    monotonicity in expectation, and guard-rail behavior."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, weight long")

    def test_selection_matches_scalar_replay(self, spark):
        import hashlib

        from aircraftutilization_etl_spark.operators.sampling import (
            weighted_sample,
        )

        rows = [(i, 1 + i % 5) for i in range(40)]
        got = [
            r.doc_id
            for r in weighted_sample(
                self._df(spark, rows), "doc_id", "weight", 10
            ).collect()
        ]

        def es_key(doc_id, w):
            return max(
                hashlib.md5(f"ws:{doc_id}:{j}".encode()).hexdigest()
                for j in range(1, w + 1)
            )

        expect = [
            d
            for d, _ in sorted(
                ((d, es_key(d, w)) for d, w in rows),
                key=lambda t: (t[1], -t[0]),
                reverse=True,
            )[:10]
        ]
        assert got == expect

    def test_higher_weight_wins_more_often(self, spark):
        # 200 rows, half weight 1 and half weight 8: the weight-8 half
        # must take a clear majority of a 50-row draw (binomial bound:
        # expected ~44, anything <= 25 would mean weights do nothing)
        from aircraftutilization_etl_spark.operators.sampling import (
            weighted_sample,
        )

        rows = [(i, 8 if i % 2 == 0 else 1) for i in range(200)]
        out = weighted_sample(self._df(spark, rows), "doc_id", "weight", 50)
        heavy = out.filter("weight = 8").count()
        assert heavy > 30

    def test_rejects_out_of_range_weight(self, spark):
        import pytest as _pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import SparkRuntimeException

        from aircraftutilization_etl_spark.operators.sampling import (
            weighted_sample,
        )

        df = self._df(spark, [(1, 0), (2, 3)])
        with _pytest.raises((Py4JJavaError, SparkRuntimeException)):
            weighted_sample(df, "doc_id", "weight", 2).collect()

    def test_top_n_is_take_ordered_not_global_sort(self, spark):
        from aircraftutilization_etl_spark.operators.sampling import (
            weighted_sample,
        )

        plan = (
            weighted_sample(
                self._df(spark, [(i, 2) for i in range(10)]),
                "doc_id",
                "weight",
                3,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestTemporalSplit:
    def _events(self, spark):
        rows = [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-21 10:00:00"),
            (2, "2024-01-21 11:00:00"),
            (2, "2024-01-26 09:00:00"),
            (3, "2024-01-26 12:00:00"),
        ]
        return spark.createDataFrame(
            rows, "user_id long, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp"))

    CUTS = [("train", "2024-01-20"), ("val", "2024-01-25"), ("test", None)]

    def test_rows_land_in_time_order_splits(self, spark):
        from aircraftutilization_etl_spark.operators.sampling import (
            temporal_split,
        )

        out = temporal_split(self._events(spark), "ts", self.CUTS)
        got = {(r.user_id, r.ts.day): r.split for r in out.collect()}
        assert got[(1, 1)] == "train"
        assert got[(1, 21)] == "val" and got[(2, 21)] == "val"
        assert got[(2, 26)] == "test" and got[(3, 26)] == "test"

    def test_audit_counts_returning_users(self, spark):
        from aircraftutilization_etl_spark.operators.sampling import (
            temporal_split,
            temporal_split_audit,
        )

        labeled = temporal_split(self._events(spark), "ts", self.CUTS)
        audit = {
            r.split: r for r in temporal_split_audit(labeled, "user_id").collect()
        }
        # user 1 returns in val; user 2 (first seen in val) returns in test
        assert audit["train"].n_returning_users == 0
        assert audit["val"].n_returning_users == 1
        assert audit["test"].n_returning_users == 1
        assert audit["val"].n_users == 2
        assert audit["test"].n_events == 2

    def test_rejects_unterminated_cuts(self, spark):
        from aircraftutilization_etl_spark.operators.sampling import (
            temporal_split,
        )

        with pytest.raises(ValueError):
            temporal_split(
                self._events(spark), "ts", [("train", "2024-01-20")]
            )


class TestGlobalRunningSumSigned:
    def test_signed_measure_with_aggregated_branching_upstream(self, spark):
        """Regression: a signed measure whose upstream contains a
        groupBy + broadcast crossJoin (two plan branches) must produce
        the exact global cumsum — partition totals must come from
        SUM(value), and both branches must observe one materialized
        partitioning (AQE may otherwise re-plan them differently,
        shifting every prefix offset)."""
        import random

        from aircraftutilization_etl_spark.operators.sampling import (
            global_running_sum,
        )

        rng = random.Random(11)
        rows = [(i, rng.randint(-40, 40)) for i in range(5003)]
        df = spark.createDataFrame(rows, "k long, v long")
        agg = df.groupBy("k").agg(F.sum("v").alias("v"))
        tot = agg.agg(F.sum("v").alias("t"))
        signed = agg.crossJoin(F.broadcast(tot)).select(
            "k", (F.col("v") * 2 - F.col("t") * 0).alias("m")
        )
        run = global_running_sum(signed, ["k"], "m", out_col="cum")
        got = {r.k: r.cum for r in run.collect()}
        acc = 0
        for k, v in sorted(rows):
            acc += 2 * v
            assert got[k] == acc


class TestKSDrift:
    def test_identical_distributions_score_zero(self, spark):
        from aircraftutilization_etl_spark.operators.profile import ks_drift

        rows = [(g, float(v)) for g in ("a", "b") for v in range(50)]
        df = spark.createDataFrame(rows, "g string, value double")
        r = ks_drift(df, "g", "value", "a", "b").collect()[0]
        assert r.ks_ppm == 0 and r.n_a == 50 and r.n_b == 50

    def test_disjoint_distributions_score_one(self, spark):
        from aircraftutilization_etl_spark.operators.profile import ks_drift

        rows = [("a", float(v)) for v in range(30)] + [
            ("b", float(v + 100)) for v in range(40)
        ]
        df = spark.createDataFrame(rows, "g string, value double")
        r = ks_drift(df, "g", "value", "a", "b").collect()[0]
        assert r.ks_ppm == 1_000_000
        # the sup is first reached at a's largest value
        assert r.ks_at_cents == 2900

    def test_matches_scipy_style_scalar_replay(self, spark):
        import random

        from aircraftutilization_etl_spark.operators.profile import ks_drift

        rng = random.Random(5)
        a = [round(rng.uniform(0, 50), 2) for _ in range(200)]
        b = [round(rng.gauss(30, 10), 2) for _ in range(150)]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, value double")
        r = ks_drift(df, "g", "value", "a", "b").collect()[0]
        ac = sorted(round(v * 100) for v in a)
        bc = sorted(round(v * 100) for v in b)
        pts = sorted(set(ac) | set(bc))
        import bisect

        best = max(
            abs(len(b) * bisect.bisect_right(ac, p) - len(a) * bisect.bisect_right(bc, p))
            for p in pts
        )
        assert r.ks_ppm == best * 1_000_000 // (len(a) * len(b))
