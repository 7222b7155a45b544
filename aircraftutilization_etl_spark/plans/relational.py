"""Relational query surface over the TPC-H-ish tables.

The reference pipeline uses only project/filter/join/when/cast
(SURVEY.md §2.8); aggregations, windows, sorts, set ops, rollups etc.
are delegated downstream. The engine exposes the full Spark relational
algebra, exercised here query-by-query with DuckDB oracles.

Scale notes are per-query docstrings: every join states its intended
physical strategy at 100 TB (broadcast for dimensions, shuffle-on-key
for fact-fact), every aggregation is partial-aggregatable (map-side
combine), and filters/projections sit directly on the scans so Catalyst
pushes them into parquet (verified in tests/test_plans_physical.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import money
from .catalog import query, table


def _money(col):
    return F.round(col, 2)


# DuckDB twins of the exact-integer money units (functions/money.py) —
# shared across the table-scale-group queries converted in r8.
_SQL_EP_CENTS = money.sql_cents("l_extendedprice")
_SQL_DISC_PCT = money.sql_cents("l_discount")
_SQL_SUM_BASE = money.sql_dollars(f"SUM({_SQL_EP_CENTS})", 1)
_SQL_SUM_DISC = money.sql_dollars(f"SUM({money.SQL_REVENUE_TM})", 100)
_SQL_SUM_CHARGE = money.sql_dollars(f"SUM({money.SQL_CHARGE_MICROS})", 10000)


# ---------------------------------------------------------------------------
# Aggregation core
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)        AS sum_qty,
           {_SQL_SUM_BASE} AS sum_base_price,
           {_SQL_SUM_DISC} AS sum_disc_price,
           {_SQL_SUM_CHARGE} AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM({_SQL_EP_CENTS}) AS DOUBLE)
                 / (100.0 * COUNT(*)), 4) AS avg_price,
           ROUND(CAST(SUM({_SQL_DISC_PCT}) AS DOUBLE)
                 / (100.0 * COUNT(*)), 4) AS avg_disc,
           COUNT(*)                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, the hash-agg workhorse.

    r8 exact-cents form (functions/money.py): the r8 sf1 sweep caught
    sum_disc_price one cent off run-to-run — merge-order IEEE drift on
    ~1.5M-term double sums, invisible below ~1e5 terms/group. Every
    money sum is now an exact integer-unit sum (cents / tenth-mills /
    micros; quantities are integers) through a 128-bit interior, and
    every average divides an exact integer numerator once — both
    engines round identical doubles.

    Scale: fully partial-aggregatable — the sums collapse map-side to
    ~|groups| rows per partition before one tiny shuffle (groups ≈ 6).
    Predicate and 7-column pruning push into the parquet scan; the
    integer units add two multiplies per row inside codegen.
    """
    l = table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money.dollars(money.sum128(money.cents("l_extendedprice")), 1).alias(
                "sum_base_price"
            ),
            money.dollars(money.sum128(money.revenue_tm()), 100).alias(
                "sum_disc_price"
            ),
            money.dollars(money.sum128(money.charge_micros()), 10000).alias(
                "sum_charge"
            ),
            F.round(
                F.sum(F.col("l_quantity").cast("long")).cast("double") / n, 4
            ).alias("avg_qty"),
            F.round(
                F.sum(money.cents("l_extendedprice")).cast("double")
                / (n * 100.0),
                4,
            ).alias("avg_price"),
            F.round(
                F.sum(money.pct("l_discount")).cast("double") / (n * 100.0), 4
            ).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {_SQL_SUM_DISC} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '2000-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY SUM({money.SQL_REVENUE_TM}) DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-k.

    Scale: customer SCALES WITH SF, so it gets no broadcast hint — AQE
    broadcasts the filtered side at runtime when it actually fits and
    demotes to shuffle when it doesn't (a forced hint would OOM at
    100 TB). orders→lineitem shuffles on orderkey (both sides
    co-partitioned by the join key, no skew: orderkey is unique).
    Top-k is TakeOrderedAndProject — no global sort. The tie-break on
    l_orderkey makes the limit deterministic for the oracle.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-03-15").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-03-15").cast("timestamp")
    )
    # r8: top-k ranks on the EXACT integer revenue (tenth-mills), not a
    # drifting double — replicated data creates exact-tie orders whose
    # double sums can split into ulp variants and flip the cut line.
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(money.revenue_tm()).alias("__rev_tm"))
        .orderBy(F.desc("__rev_tm"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            money.dollars(F.col("__rev_tm"), 100).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@query(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name,
           {_SQL_SUM_DISC} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY SUM({money.SQL_REVENUE_TM}) DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table snowflake join with a same-nation constraint.

    r8 exact-cents form (functions/money.py): the r8 sf1 sweep caught
    the nation revenue one cent off run-to-run (merge-order IEEE drift
    at ~2.4e5 terms/group); revenue is now an exact tenth-mill sum
    through a 128-bit interior, ordered and emitted drift-free.

    Scale: only the FIXED-cardinality dims (nation 25, region 5) carry
    broadcast hints; customer/supplier scale with SF, so their join
    strategy is AQE's runtime call (broadcast while they fit, shuffle
    beyond). The lineitem-orders shuffle on orderkey is the one
    unavoidable big exchange.
    """
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money.sum128(money.revenue_tm()).alias("__rev_tm"))
        .orderBy(F.desc("__rev_tm"), "n_name")
        .select(
            "n_name", money.dollars(F.col("__rev_tm"), 100).alias("revenue")
        )
    )


@query(
    "q_rollup_revenue",
    f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {_SQL_SUM_BASE} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (grouping sets) — absent from the reference,
    exposed per SURVEY.md §2.8.

    r8 exact-cents form: the grand-total grouping set sums the WHOLE
    table — exactly the term count where double summation drifts
    (functions/money.py); revenue is an exact cents sum now.

    Scale: rollup expands to 3 grouping sets; Spark computes them in one
    pass with partial aggregation (Expand + HashAggregate).
    COALESCE folds the grouping-null indicator into a label so the
    output is null-free and engine-agnostic.
    """
    l = table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            money.dollars(
                money.sum128(money.cents("l_extendedprice")), 1
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "q_cube_order_priority",
    f"""
    SELECT COALESCE(o_orderstatus, 'ALL')  AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           COUNT(*) AS n_orders,
           {money.sql_dollars(f"SUM({money.sql_cents('o_totalprice')})", 1)}
               AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY orderstatus, orderpriority
    """,
)
def q_cube_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two order dimensions (all 4 grouping sets in one pass).

    r8 exact-cents form: the (ALL, ALL) cell sums every order — exact
    cents through a 128-bit interior (functions/money.py)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money.dollars(money.sum128(money.cents("o_totalprice")), 1).alias(
                "total"
            ),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total",
        )
        .orderBy("orderstatus", "orderpriority")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@query(
    "q_top_customers_per_nation",
    """
    SELECT n_name, c_name, c_acctbal, rnk FROM (
        SELECT n_name, c_name, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
               ) AS rnk
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rnk <= 3
    ORDER BY n_name, rnk
    """,
)
def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window.

    Scale: one shuffle on the partition key; row_number cuts each group
    to 3 rows before anything else materializes. c_custkey tie-break
    makes ranks deterministic.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_name", "c_acctbal", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .orderBy("n_name", "rnk")
    )


@query(
    "q_running_revenue",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_day,
               CAST(SUM({money.sql_cents('o_totalprice')}) AS BIGINT)
                   AS day_cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        GROUP BY 1
    )
    SELECT order_day,
           day_cents / 100.0 AS day_total,
           CAST(SUM(day_cents) OVER (ORDER BY order_day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               / 100.0 AS running_total,
           ROUND(CAST(SUM(day_cents) OVER (ORDER BY order_day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / (100.0 * COUNT(*) OVER (ORDER BY order_day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)), 4) AS ma7
    FROM daily ORDER BY order_day
    """,
)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 7-day moving average with explicit ROWS frames.

    r8 exact-cents form: per-day groups GROW with SF (~2.4k orders/day
    at sf1), so day_total is an exact cents sum; the running total and
    moving average then sum exact integers — no windowed double
    accumulation anywhere (functions/money.py).

    Scale: the unpartitioned window runs over the *daily* rollup
    (≤ ~1500 rows regardless of fact size) — aggregate first, window
    after, so the single-partition window never sees raw facts.
    """
    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(F.sum(money.cents("o_totalprice")).alias("day_cents"))
    )
    w_run = Window.orderBy("order_day").rowsBetween(Window.unboundedPreceding, 0)
    w_ma = Window.orderBy("order_day").rowsBetween(-6, 0)
    return daily.select(
        "order_day",
        (F.col("day_cents") / 100.0).alias("day_total"),
        (F.sum("day_cents").over(w_run) / 100.0).alias("running_total"),
        F.round(
            F.sum("day_cents").over(w_ma).cast("double")
            / (F.count(F.lit(1)).over(w_ma) * 100.0),
            4,
        ).alias("ma7"),
    ).orderBy("order_day")


@query(
    "q_order_value_lag",
    """
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(o_totalprice - LAG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
               + 0.0 AS delta_prev
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, order_day, o_orderkey
    """,
)
def q_order_value_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG over per-customer order history (offset window function)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_day"),
        _money(F.col("o_totalprice")).alias("totalprice"),
        (
            _money(F.col("o_totalprice") - F.lag("o_totalprice").over(w))
            + 0.0
        ).alias("delta_prev"),
    ).orderBy("o_custkey", "order_day", "o_orderkey")


# ---------------------------------------------------------------------------
# Join-type coverage (semi / anti / full-outer / cross)
# ---------------------------------------------------------------------------

@query(
    "q_semi_join_active_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def q_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — customers with at least one big order.

    Scale: semi join never duplicates the left side and Spark stops
    probing a key at first match; at 100 TB this shuffles on custkey or
    broadcasts the filtered orders-key set if small.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_anti_join_orderless_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def q_anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — customers with no orders at all."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_full_outer_merge",
    """
    WITH order_counts AS (
        SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    ),
    cust AS (SELECT c_custkey AS custkey, c_name, c_acctbal FROM customer)
    SELECT COALESCE(c.custkey, oc.custkey) AS custkey,
           c.c_name,
           COALESCE(oc.n_orders, 0) AS n_orders,
           COALESCE(oc.total_spend, 0.0) AS total_spend
    FROM cust c FULL OUTER JOIN order_counts oc ON c.custkey = oc.custkey
    ORDER BY custkey
    """,
)
def q_full_outer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join with coalesced key + zero-fill — the J1+C1 state
    merge shape (SURVEY.md §2.4/§2.5) on the synthetic tables.

    The string-key join form coalesces the key exactly like pandas
    ``merge(on=...)``; na.fill(0) reproduces the post-join sentinel fill.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_acctbal"
    )
    counts = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money(F.sum("o_totalprice")).alias("total_spend"),
    )
    return (
        c.join(counts, on="custkey", how="full_outer")
        .na.fill({"n_orders": 0, "total_spend": 0.0})
        .select("custkey", "c_name", "n_orders", "total_spend")
        .orderBy("custkey")
    )


@query(
    "q_cross_join_region_status",
    """
    SELECT r_name, s.o_orderstatus,
           COALESCE(cnt.n, 0) AS n_orders
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    LEFT JOIN (
        SELECT r2.r_name AS rn, o.o_orderstatus AS st, COUNT(*) AS n
        FROM orders o
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region r2 ON n_regionkey = r2.r_regionkey
        GROUP BY 1, 2
    ) cnt ON cnt.rn = r_name AND cnt.st = s.o_orderstatus
    ORDER BY r_name, s.o_orderstatus
    """,
)
def q_cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (dense dimension grid) + left join of observed counts —
    the dense-report pattern that keeps empty cells as zeros."""
    r = table(spark, sf_dir, "region").select("r_name")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    statuses = o.select("o_orderstatus").distinct()
    grid = r.crossJoin(statuses)
    counts = (
        # customer scales with SF: no broadcast hint (AQE decides);
        # nation/region are fixed-size dims.
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("rn"), F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(
            counts,
            (grid.r_name == counts.rn) & (grid.o_orderstatus == counts.st),
            "left",
        )
        .select("r_name", "o_orderstatus", F.coalesce("n", F.lit(0)).alias("n_orders"))
        .orderBy("r_name", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Set operations / distinct
# ---------------------------------------------------------------------------

@query(
    "q_set_ops_nations",
    """
    WITH cust_nations AS (SELECT DISTINCT n_name FROM customer
                          JOIN nation ON c_nationkey = n_nationkey),
         supp_nations AS (SELECT DISTINCT n_name FROM supplier
                          JOIN nation ON s_nationkey = n_nationkey)
    SELECT n_name, 'both' AS presence FROM
        (SELECT n_name FROM cust_nations INTERSECT SELECT n_name FROM supp_nations)
    UNION ALL
    SELECT n_name, 'customer_only' AS presence FROM
        (SELECT n_name FROM cust_nations EXCEPT SELECT n_name FROM supp_nations)
    ORDER BY presence, n_name
    """,
)
def q_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one query (SURVEY.md §2.8 gap list)."""
    n = table(spark, sf_dir, "nation")
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name")
        .distinct()
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name")
        .distinct()
    )
    both = cust.intersect(supp).select("n_name", F.lit("both").alias("presence"))
    cust_only = cust.exceptAll(supp).select(
        "n_name", F.lit("customer_only").alias("presence")
    )
    return both.unionAll(cust_only).orderBy("presence", "n_name")


@query(
    "q_distinct_count_brands",
    """
    SELECT p_type,
           CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(MIN(p_retailprice), 2) AS min_price,
           ROUND(MAX(p_retailprice), 2) AS max_price
    FROM part GROUP BY p_type ORDER BY p_type
    """,
)
def q_distinct_count_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + min/max per group (distinct-aggregate planning)."""
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy("p_type")
        .agg(
            F.countDistinct("p_brand").alias("n_brands"),
            F.count(F.lit(1)).alias("n_parts"),
            _money(F.min("p_retailprice")).alias("min_price"),
            _money(F.max("p_retailprice")).alias("max_price"),
        )
        .orderBy("p_type")
    )


# ---------------------------------------------------------------------------
# Conditional / cast / scalar-function surface (C*, T*, U* shapes)
# ---------------------------------------------------------------------------

@query(
    "q_case_when_buckets",
    f"""
    SELECT CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS qty_bucket,
           CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS ret,
           COUNT(*) AS n,
           {_SQL_SUM_DISC} AS revenue
    FROM lineitem
    GROUP BY 1, 2 ORDER BY qty_bucket, ret
    """,
)
def q_case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when()-chain bucketing — the U1/U2 kernel shape (SURVEY.md §2.7)
    applied to the synthetic facts; pure column expressions, codegen'd.

    r8 exact-cents revenue: six table-scale buckets — exact tenth-mill
    sums through a 128-bit interior (functions/money.py)."""
    l = table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
    )
    ret = F.when(F.col("l_returnflag") == "R", "returned").otherwise("kept")
    return (
        l.groupBy(bucket.alias("qty_bucket"), ret.alias("ret"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money.dollars(money.sum128(money.revenue_tm()), 100).alias(
                "revenue"
            ),
        )
        .orderBy("qty_bucket", "ret")
    )


@query(
    "q_casts_and_dates",
    """
    SELECT CAST(YEAR(o_orderdate) AS INT)  AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS first_day_str,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY o_orderdate
    HAVING COUNT(*) > 1
    ORDER BY order_year, order_month, first_day_str
    """,
)
def q_casts_and_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast surface (T1-T3 shapes): timestamp→date→string, extract
    year/month, money→integer-cents; HAVING filter post-agg."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderdate")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("_t"))
        .filter(F.col("n_orders") > 1)
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.to_date("o_orderdate").cast("string").alias("first_day_str"),
            F.col("n_orders"),
            F.round(F.col("_t") * 100, 0).cast("bigint").alias("total_cents"),
        )
        .orderBy("order_year", "order_month", "first_day_str")
    )


@query(
    "q_string_functions",
    """
    SELECT p_brand,
           UPPER(p_brand) AS brand_upper,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM part
    WHERE p_name LIKE '%a%' AND CONTAINS(p_type, 'S')
    GROUP BY p_brand, p_name, p_type
    ORDER BY p_brand, name_prefix, brand_type
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: UPPER/SUBSTRING/LENGTH/CONCAT/REPLACE/
    LIKE/CONTAINS — all JVM-side, no UDFs (SURVEY.md §2.7 notes the
    reference has zero string functions; the engine exposes Spark's)."""
    p = table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%a%") & F.col("p_type").contains("S"))
        .groupBy("p_brand", "p_name", "p_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "p_brand",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_type", " ", "_").alias("type_snake"),
            "n",
        )
        .orderBy("p_brand", "name_prefix", "brand_type")
    )


@query(
    "q_order_priority_check",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2000-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS subquery → semi join + agg."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-10-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    late = o.join(
        l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi"
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_scalar_subquery_above_avg",
    """
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    ORDER BY c_custkey
    """,
)
def q_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate (Spark SQL path).

    Scale: the subquery is an independent 1-row aggregate broadcast into
    the filter — no rescan of customer per row.
    """
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
        FROM customer_v
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_v)
        ORDER BY c_custkey
        """
    )


@query(
    "q_union_fact_slices",
    """
    SELECT * FROM (
        SELECT 'high_value' AS slice, o_orderkey, ROUND(o_totalprice, 2) AS val
        FROM orders WHERE o_totalprice > 350000
        UNION ALL
        SELECT 'urgent' AS slice, o_orderkey, ROUND(o_totalprice, 2) AS val
        FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
    ) ORDER BY slice, o_orderkey
    """,
)
def q_union_fact_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of filtered slices (a row may appear in both — bag
    semantics preserved)."""
    o = table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 350000).select(
        F.lit("high_value").alias("slice"),
        "o_orderkey",
        _money(F.col("o_totalprice")).alias("val"),
    )
    urgent = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    ).select(
        F.lit("urgent").alias("slice"),
        "o_orderkey",
        _money(F.col("o_totalprice")).alias("val"),
    )
    return high.unionAll(urgent).orderBy("slice", "o_orderkey")


@query(
    "q_pivot_status_by_segment",
    """
    SELECT c_mktsegment,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) — order-status counts per market segment.

    The explicit value list keeps the pivot a single pass (no extra
    distinct-values job) — the form that scales.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        # customer scales with SF — join strategy left to AQE
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "c_mktsegment",
            F.col("F").alias("f"),
            F.col("O").alias("o"),
            F.col("P").alias("p"),
        )
        .orderBy("c_mktsegment")
    )
