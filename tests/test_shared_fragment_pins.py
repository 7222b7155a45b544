"""Literal-value pins for SHARED Spark+DuckDB fragments beyond money.

The cross-engine oracle gate is structurally blind to a helper that is
wrong the same way on both sides (the r8 `dollars()` 100x-scaling bug
was hash-green on both engines). functions/money.py got literal pins in
r8; this module extends the pattern (VERDICT r8 #7) to the remaining
shared two-sided pieces — the md5 split/shard/mix placement family,
where the SAME Python constant or renderer feeds both the Spark plan
and the interpolated oracle SQL. Ground truth here is a THIRD
implementation: Python's hashlib + hand-computed integers, never
cross-engine agreement.
"""

from __future__ import annotations

import hashlib

import duckdb

from aircraftutilization_etl_spark.operators.sampling import (
    hash_split,
    mix_epochs,
    shard_and_order,
    split_thresholds,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()  # noqa: S324


# --- the hex bound constants ------------------------------------------------


def test_split_bounds_are_the_intended_fractions():
    """'cccd' and 'e666' are not magic — they are round(frac * 16^4).
    Both plans-side literals and the operator's generator must agree
    with the arithmetic, independently of either engine."""
    assert format(round(0.8 * 16**4), "04x") == "cccd"
    assert format(round(0.9 * 16**4), "04x") == "e666"
    assert split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1}) == [
        ("train", "cccd"),
        ("val", "e666"),
        ("test", "g"),
    ]
    # the literals interpolated into oracle SQL are the same constants
    from aircraftutilization_etl_spark.plans import contamination, curation
    from aircraftutilization_etl_spark.plans import sampling as sampling_plans

    assert contamination._TRAIN_BOUND == "e666"  # noqa: SLF001
    assert curation._TRAIN_BOUND == "e666"  # noqa: SLF001
    assert "'cccd'" in sampling_plans._SPLIT_CASE  # noqa: SLF001
    assert "'e666'" in sampling_plans._SPLIT_CASE  # noqa: SLF001


def test_hash_split_matches_hashlib(spark):
    """Spark-side split assignment vs a hashlib-computed expectation."""
    ids = list(range(1, 201))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }

    def expect(i: int) -> str:
        p = _md5(str(i))[:4]
        return "train" if p < "cccd" else ("val" if p < "e666" else "test")

    assert got == {i: expect(i) for i in ids}
    # the fractions actually land near 80/10/10 on this window
    from collections import Counter

    c = Counter(got.values())
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_split_sql_case_matches_hashlib():
    """The oracle-side CASE fragment classifies identically to hashlib
    — pinned on DuckDB directly, not via Spark agreement."""
    from aircraftutilization_etl_spark.plans import sampling as sampling_plans

    case = sampling_plans._SPLIT_CASE  # noqa: SLF001
    con = duckdb.connect()
    ids = list(range(1, 201))
    rows = con.sql(
        f"SELECT doc_id, {case} AS split FROM (SELECT UNNEST(range(1, 201))"
        " AS doc_id) t ORDER BY doc_id"
    ).fetchall()

    def expect(i: int) -> str:
        p = _md5(str(i))[:4]
        return "train" if p < "cccd" else ("val" if p < "e666" else "test")

    assert {int(i): s for i, s in rows} == {i: expect(i) for i in ids}


# --- seeded shard placement -------------------------------------------------


def test_shard_assignment_matches_hashlib(spark):
    from aircraftutilization_etl_spark.plans.sampling import (
        N_SHARDS,
        SHARD_SEED,
    )

    ids = list(range(1, 101))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = shard_and_order(df, "doc_id", N_SHARDS, seed=SHARD_SEED).collect()
    got = {r["doc_id"]: r["shard"] for r in out}
    exp = {
        i: int(_md5(f"{SHARD_SEED}:{i}")[:4], 16) % N_SHARDS for i in ids
    }
    assert got == exp
    # position within a shard follows full-digest order (tie-broken by
    # key): recompute shard 0's ordering from hashlib
    by_shard = sorted(
        (r["doc_id"] for r in out if r["shard"] == 0),
        key=lambda i: (_md5(f"{SHARD_SEED}:{i}"), i),
    )
    got_pos = sorted(
        ((r["pos"], r["doc_id"]) for r in out if r["shard"] == 0)
    )
    assert [d for _, d in got_pos] == by_shard


def test_shard_sql_fragment_matches_hashlib():
    """The DuckDB digest→shard expression (as interpolated into the
    q_shard_order oracle) against hashlib."""
    from aircraftutilization_etl_spark.plans.sampling import (
        N_SHARDS,
        SHARD_SEED,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT doc_id,
               CAST(CAST('0x' || substr(
                   md5('{SHARD_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 4)
                   AS INTEGER) % {N_SHARDS} AS INT) AS shard
            FROM (SELECT UNNEST(range(1, 101)) AS doc_id) t"""
    ).fetchall()
    exp = {
        i: int(_md5(f"{SHARD_SEED}:{i}")[:4], 16) % N_SHARDS
        for i in range(1, 101)
    }
    assert {int(i): s for i, s in rows} == exp


# --- fractional-epoch mix ---------------------------------------------------


def test_mix_epochs_copies_match_hand_computed(spark):
    """4 rows at 2.25 epochs: base 2 copies each + k = (4*250000) DIV
    1e6 = 1 extra copy, granted to the FIRST row in md5 order — 9 rows
    total, and which doc repeats 3x is pinned via hashlib."""
    df = spark.createDataFrame(
        [(i, "web") for i in (11, 22, 33, 44)], "doc_id long, source string"
    )
    out = mix_epochs(df, {"web": 2_250_000}).collect()
    assert len(out) == 9
    from collections import Counter

    copies = Counter(r["doc_id"] for r in out)
    first_by_md5 = min((11, 22, 33, 44), key=lambda i: (_md5(str(i)), i))
    assert copies[first_by_md5] == 3
    assert all(v == 2 for k, v in copies.items() if k != first_by_md5)
    # epoch_idx is 0-based per copy
    assert sorted(
        r["epoch_idx"] for r in out if r["doc_id"] == first_by_md5
    ) == [0, 1, 2]


def test_mix_spec_values_renders_the_spec():
    """The VALUES renderer feeding the q_mix_epochs oracle, pinned
    against the literal expected string (dict order = src0..src19,
    eppm = (i mod 8) * 500000 + 250000)."""
    from aircraftutilization_etl_spark.plans.sampling import (
        EPOCHS_PPM,
        _mix_spec_values,
    )

    cycle = [
        250_000, 750_000, 1_250_000, 1_750_000,
        2_250_000, 2_750_000, 3_250_000, 3_750_000,
    ]
    assert EPOCHS_PPM == {f"src{i}": cycle[i % 8] for i in range(20)}
    expected = ", ".join(
        f"('src{i}', {cycle[i % 8]})" for i in range(20)
    )
    assert _mix_spec_values() == expected
