"""operators/skew.chunked_self_pairs — the shared Zipf-head guard.

Output-invariance is the whole contract: the chunked join must produce
EXACTLY the plain self-join's multiset of (pair, shared-key) rows,
payload included, for hot keys far above the cap and for normal keys
(m=1 degenerate path) alike.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aircraftutilization_etl_spark.operators.skew import chunked_self_pairs


def _plain_pairs(keyed, key_cols, id_col, payload):
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        *key_cols,
        *[F.col(c).alias(n[0]) for c, n in payload.items()],
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        *key_cols,
        *[F.col(c).alias(n[1]) for c, n in payload.items()],
    )
    return (
        a.join(b, list(key_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *[n for ns in payload.values() for n in ns])
    )


def test_hot_key_output_identical_with_payload(spark):
    cap = 7  # tiny cap so even a 60-member bucket chunks into 9 groups
    rng = random.Random(17)
    rows = [
        (i, rng.choice(["hot"] * 8 + [f"cold{i % 11}"]), float(i % 5) + 0.5)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, k string, w double")
    payload = {"w": ("wa", "wb")}
    got = sorted(
        map(
            tuple,
            chunked_self_pairs(df, ["k"], "doc_id", cap, payload).collect(),
        )
    )
    want = sorted(
        map(tuple, _plain_pairs(df, ["k"], "doc_id", payload).collect())
    )
    assert got == want
    assert len(got) > 1000  # the hot key really is quadratic here


def test_multiset_semantics_per_shared_key(spark):
    # two rows per (id, key) never occur in our consumers, but multiple
    # shared KEYS per pair do: each shared key must yield exactly one row
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = chunked_self_pairs(df, ["k"], "doc_id", 64).groupBy(
        "id_a", "id_b"
    ).count()
    got = {(r.id_a, r.id_b): r["count"] for r in out.collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
