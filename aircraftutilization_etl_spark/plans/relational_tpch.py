"""Harder TPC-H shapes: multi-nation joins, group-filter-vs-scalar,
distribution aggregates, view+max, IN-over-grouped-HAVING, and
multi-correlated EXISTS/NOT EXISTS.

The synthetic schema is a reduced TPC-H (no partsupp, no comment or
commit/receipt-date columns), so each query keeps its TPC-H *structural
shape* — the join/subquery/aggregation pattern Catalyst must plan — with
filters adapted to the columns that exist. Adaptations are noted
per-query.

Scale commentary follows plans/relational.py conventions: fixed-size
dims (nation 25, region 5) are broadcast; SF-scaled tables are left to
AQE; the lineitem/orders shuffle on orderkey is the one unavoidable big
exchange in each fact query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import money
from .catalog import query, table


def _money(col):
    return F.round(col, 2)


@query(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {money.sql_dollars("SUM(volume)", 100)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INT) AS l_year,
               {money.SQL_REVENUE_TM} AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                      JOIN orders   ON o_orderkey = l_orderkey
                      JOIN customer ON c_custkey = o_custkey
                      JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Shape: the same dimension (nation) joins TWICE under different roles
    (supplier's vs customer's), with a symmetric pair predicate across
    the two roles — the self-role-join pattern.

    Scale: both nation joins broadcast (25 rows each); the pair
    predicate prunes to 2/625 of nation pairs right at the broadcast
    joins, before the orderkey shuffle output ever aggregates.
    """
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            # r8 exact-cents (functions/money.py): nation-pair-year
            # groups scale with SF — exact tenth-mill sums
            money.dollars(money.sum128(money.revenue_tm()), 100).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                          THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               {money.SQL_REVENUE_TM} AS volume,
               n2.n_name AS supp_nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region    ON n1.n_regionkey = r_regionkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share inside a region, by year.

    Shape: 8-way snowflake with nation joined twice (customer-side role
    restricts the market, supplier-side role is the share dimension) and
    a conditional-sum ratio.

    r8 exact-cents (functions/money.py): numerator and denominator are
    exact tenth-mill sums (128-bit interior), so the share is ONE
    division of two identical exact integers on both engines — the
    former double-sum ratio inherited summation-order drift in both
    operands.

    Scale: part/nation/region broadcast; the share is two partial-
    aggregatable sums in one pass — no second scan for the denominator.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    volume_tm = money.revenue_tm()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                money.sum128(
                    F.when(
                        F.col("supp_nation") == "NATION_3", volume_tm
                    ).otherwise(F.lit(0).cast("long"))
                ).cast("double")
                / money.sum128(volume_tm).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q11_important_parts",
    f"""
    WITH nation_lines AS (
        SELECT l_partkey, {money.SQL_REVENUE_TM} AS value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
    )
    SELECT l_partkey AS partkey,
           {money.sql_dollars("SUM(value)", 100)} AS total_value
    FROM nation_lines
    GROUP BY l_partkey
    HAVING SUM(value) * 1000 > (SELECT SUM(value) FROM nation_lines)
    ORDER BY SUM(value) DESC, partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group aggregate HAVING-filtered against an
    uncorrelated scalar subquery over the SAME derived input (partsupp
    doesn't exist in the reduced schema; lineitem value per part for one
    nation's suppliers stands in for supply value).

    r8 exact form (functions/money.py): the 0.1%-of-grand-total cut is
    the cross-multiplied integer comparison part_tm·1000 > total_tm —
    a drifting double threshold could flip marginal parts; the grand
    total runs through a 128-bit interior (table-scale group).

    Scale: the derived input is computed once and feeds both the
    per-part aggregate and the grand total; the 1-row total broadcasts
    into the HAVING filter (no rescan, no driver round-trip).
    """
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    lines = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", money.revenue_tm().alias("value"))
    )
    per_part = lines.groupBy("l_partkey").agg(
        F.sum("value").alias("value_tm")
    )
    total = lines.agg(money.sum128(F.col("value")).alias("total_tm"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("value_tm").cast("decimal(38,0)") * 1000
            > F.col("total_tm")
        )
        .orderBy(F.desc("value_tm"), "l_partkey")
        .select(
            F.col("l_partkey").alias("partkey"),
            money.dollars(F.col("value_tm"), 100).alias("total_value"),
        )
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, zero bucket
    included (the left join keeps orderless customers; the priority
    exclusion stands in for the comment NOT-LIKE filter the reduced
    schema lacks).

    Shape: two stacked aggregations — count per customer, then count of
    customers per count.

    Scale: the left join shuffles on custkey; the second aggregation's
    input is |customers| rows and its output ~tens of buckets, both
    partial-aggregatable.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                   AS rev_tm
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    ),
    ranked AS (
        SELECT supplier_no, rev_tm, MAX(rev_tm) OVER () AS max_tm
        FROM revenue
    )
    SELECT s_suppkey, s_name,
           CAST((rev_tm + 50) // 100 AS BIGINT) / 100.0 AS total_revenue
    FROM supplier JOIN ranked ON s_suppkey = supplier_no
    WHERE rev_tm = max_tm
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum 3-month revenue — the
    view + scalar-max shape.

    r8 exact-cents form: prices and discounts are 2-dp, so per-row
    revenue is computed as exact BIGINT tenth-mills (cents x integer
    percent) and summed without IEEE summation-order drift — the r7
    sf1 sweep showed replicated exact-tie revenue families splitting
    into ulp variants under double summation, making MAX ties differ
    across engines (SCALE.md). The max and the equality now compare
    exact integers; the 2-dp output is an integer half-up divide then
    one double division (bit-identical cross-engine).

    The max still comes from a window over the ONE materialized revenue
    aggregate (single-evaluation form on both engines).

    Scale: revenue is one partial-aggregated shuffle on suppkey (the
    supplier dimension is small post-agg); the unpartitioned window runs
    over |suppliers| rows, not facts. BIGINT headroom: per-row tm <=
    ~1e9; a supplier group needs >9e9 qualifying rows to overflow —
    far beyond per-supplier fact counts at 100 TB.
    """
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(money.revenue_tm()).alias("rev_tm")
    )
    ranked = revenue.withColumn(
        "max_tm", F.max("rev_tm").over(Window.partitionBy())
    )
    return (
        s.join(ranked, s.s_suppkey == ranked.supplier_no)
        .filter(F.col("rev_tm") == F.col("max_tm"))
        .select(
            "s_suppkey",
            "s_name",
            (F.expr("(rev_tm + 50) DIV 100") / 100.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind the largest-quantity orders — IN over
    a grouped HAVING subquery (threshold 250 ≈ the p99 order quantity of
    the synthetic data).

    Scale: the IN-subquery is a semi join against an already-aggregated
    (and therefore tiny) key set — the aggregation happens BEFORE the
    join, so the probe side is |qualifying orders|, not |lineitem|.
    Top-100 is TakeOrderedAndProject, no global sort.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big_orders = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big_orders, o.o_orderkey == big_orders.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_money(F.sum("l_quantity")).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_day"),
            _money(F.col("o_totalprice")).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q21_suppliers_kept_waiting",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n_name = 'NATION_7'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole failing supplier on multi-supplier
    orders — one correlated EXISTS plus one correlated NOT EXISTS
    against the same fact table under different predicates (the
    returned-flag 'R' stands in for receipt-after-commit lateness,
    which the reduced schema can't express).

    Scale: both correlations become orderkey-equi semi/anti joins — all
    three lineitem roles shuffle on the same key, so AQE co-partitions
    them in one exchange family; nation broadcasts; no per-row
    subquery execution anywhere.
    """
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = table(spark, sf_dir, "lineitem")
    l1 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k1"), F.col("l_suppkey").alias("sk1")
    )
    l2 = l.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(s, F.col("sk1") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("k1") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("k1") == F.col("k2")) & (F.col("sk1") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k1") == F.col("k3")) & (F.col("sk1") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ----------------------------------------------------------------------
# Remaining TPC-H shapes (Q2/Q6/Q9/Q10/Q12/Q14/Q16/Q17/Q19/Q20/Q22) —
# with Q1/Q3/Q4(q_order_priority_check)/Q5/Q7/Q8/Q11/Q13/Q15/Q18/Q21
# above and in plans/relational.py this completes all 22 query shapes.
# partsupp does not exist in the reduced schema; where TPC-H needs it,
# a per-(part, supplier) aggregate of lineitem stands in (noted
# per-query).


@query(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost,
               s_name, s_acctbal, n_name
        FROM ps JOIN supplier ON ps_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
                JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT *, MIN(ps_supplycost) OVER (PARTITION BY ps_partkey)
                  AS min_cost
        FROM eu
    )
    SELECT s_acctbal, s_name, n_name, p_partkey AS partkey,
           ps_supplycost AS supplycost
    FROM part JOIN ranked ON p_partkey = ps_partkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: the cheapest regional supplier per qualifying part.

    Shape: correlated scalar MIN subquery (min supply cost for THIS
    part), realized as a window-min over the supplier-region relation so
    the cost is evaluated once — a float equality against a re-computed
    min could silently drop the winner. partsupp stands in as the
    per-(part, supplier) MIN unit price from lineitem; the unit price is
    emitted unrounded because both engines derive the identical double
    from the same rows (no order-sensitive arithmetic).

    Scale: the window runs over the aggregated (part x supplier)
    relation, never over facts; nation/region broadcast; the partkey
    window shuffle is also the join key for the part probe, so the
    exchange is reused.
    """
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    ps = l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        )
    )
    eu = (
        ps.join(s, F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name",
                "s_acctbal", "n_name")
    )
    ranked = eu.withColumn(
        "min_cost",
        F.min("ps_supplycost").over(Window.partitionBy("ps_partkey")),
    )
    return (
        ranked.join(p, F.col("ps_partkey") == p.p_partkey)
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").alias("partkey"),
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "partkey")
        .limit(100)
    )


@query(
    "q6_forecast_revenue",
    f"""
    SELECT {money.sql_dollars(f"SUM({money.SQL_DISCOUNT_TM})", 100)}
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue delta from hypothetically dropping discounts —
    the pure scan-and-aggregate query.

    r8 exact-cents (functions/money.py): ONE group over the whole
    filtered table — the maximal-drift shape; exact tenth-mill sum
    through a 128-bit interior.

    Scale: every predicate and both referenced columns push into the
    parquet scan (min/max row-group skipping on l_shipdate); the
    aggregate is a single partial+final sum with no grouping key, so the
    exchange carries one row per partition.
    """
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money.dollars(money.sum128(money.discount_tm()), 100).alias(
                "revenue"
            )
        )
    )


@query(
    "q9_product_type_profit",
    """
    SELECT nation, o_year,
           CAST(CASE WHEN sum_tm >= 0 THEN (sum_tm + 50) // 100
                     ELSE -((-sum_tm + 50) // 100) END AS BIGINT) / 100.0
               AS sum_profit
    FROM (
        SELECT nation, o_year, SUM(amount_tm) AS sum_tm
        FROM (
            SELECT n_name AS nation,
                   CAST(YEAR(o_orderdate) AS INT) AS o_year,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                   - 60 * CAST(ROUND(p_retailprice * 100) AS BIGINT)
                     * CAST(l_quantity AS BIGINT) AS amount_tm
            FROM part JOIN lineitem ON p_partkey = l_partkey
                      JOIN supplier ON s_suppkey = l_suppkey
                      JOIN orders   ON o_orderkey = l_orderkey
                      JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
    ) agg
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on a product line by supplier nation and year.

    Shape: 5-way snowflake grouped by a dimension attribute and a
    derived year. The reduced schema has no ps_supplycost; cost is
    modeled as 60% of the part's retail price — the structural point
    (profit = revenue minus a cost joined in from another table) is
    unchanged.

    r8 exact-cents form: per-row profit is exact BIGINT tenth-mills
    (prices are 2-dp cents, discounts whole percents, quantities
    integers; 0.6 x retail x qty = 60 x retail_cents x qty tenth-mills
    exactly), summed without IEEE drift — ROUND(SUM(double),2) stopped
    being cross-engine stable at sf1's ~1e5-term groups (12/175 rows
    one cent off, SCALE.md). The 2-dp output is a sign-symmetric
    integer half-away-from-zero divide (operands kept non-negative so
    trunc-vs-floor division semantics can't diverge) then one double
    division — bit-identical cross-engine.

    Scale: the part filter prunes BEFORE the fact join (LIKE on a
    dimension, then broadcast); lineitem shuffles once on orderkey for
    the orders join; nation broadcast closes the snowflake. BIGINT
    headroom: |amount_tm| <= ~2e9/row; a nation-year group overflows
    only past ~4e9 rows — beyond any single group at 100 TB.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount_tm = money.revenue_tm() - 60 * money.cents(
        "p_retailprice"
    ) * F.col("l_quantity").cast("long")
    half_up = F.expr(
        "CASE WHEN sum_tm >= 0 THEN (sum_tm + 50) DIV 100"
        " ELSE -((-sum_tm + 50) DIV 100) END"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount_tm).alias("sum_tm"))
        .select(
            "nation", "o_year", (half_up / 100.0).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders  ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation  ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a quarter.

    Scale: both fact filters (date on orders, returnflag on lineitem)
    push to their scans before the orderkey shuffle; top-20 by the
    ROUNDED revenue (deterministic across engines, custkey tie-break)
    is TakeOrderedAndProject — no global sort.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_by_linestatus",
    """
    SELECT l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'A'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY linestatus
    ORDER BY linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: orders bucketed by a lineitem attribute with
    dual conditional counts of priority classes (l_linestatus stands in
    for the missing l_shipmode; the returnflag filter for the missing
    commit/receipt-date lateness predicate).

    Scale: one orderkey shuffle; both CASE sums fold into a single
    partial aggregation pass.
    """
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


@query(
    "q14_promo_effect",
    """
    SELECT ROUND(
             100.00 * SUM(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promo parts — the
    conditional-sum ratio over a dimension attribute.

    Scale: one month of lineitem (scan-pruned) broadcast-joins the part
    dimension; numerator and denominator are two partial sums in one
    aggregation pass, no second scan.
    """
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", volume).otherwise(0.0))
                / F.sum(volume),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    (brand, type, size) bucket, excluding a blacklist subquery
    (negative-balance suppliers stand in for the complaint-comment
    NOT IN; the lineitem relationship stands in for partsupp).

    Scale: NOT IN over a never-null key compiles to a broadcast anti
    join (the blacklist is tiny); COUNT(DISTINCT) expands to the
    standard two-shuffle expand-then-count, both partial-aggregated.
    """
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    l = table(spark, sf_dir, "lineitem")
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    f"""
    SELECT CAST((2 * SUM({money.sql_cents('l_extendedprice')}) + 7) // 14
                AS BIGINT) / 100.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost if small-quantity orders were dropped —
    the correlated aggregate subquery (per-part average) shape.

    Scale: the correlation is decorrelated by hand exactly as Catalyst
    would: one partial-aggregated pass computes 0.2*avg(qty) per part,
    then joins back on partkey. The per-part averages relation is
    |parts|-sized, so AQE turns the join-back into a broadcast; facts
    are never shuffled twice.
    """
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    cuts = l.groupBy(F.col("l_partkey").alias("cut_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    # r8 exact-cents: round(Σcents/7) as the integer (2Σ+7) DIV 14 —
    # half-up of a cents/7 quotient without any double rounding
    # (functions/money.py; the qty_cut comparison is already exact:
    # integer sums stay exact in double, so 0.2*avg is deterministic)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(cuts, l.l_partkey == F.col("cut_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(money.sum128(money.cents("l_extendedprice")).alias("__c"))
        .select(
            (
                F.floor((2 * F.col("__c") + 7) / 14).cast("long") / 100.0
            ).alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_revenue",
    f"""
    SELECT {money.sql_dollars(f"SUM({money.SQL_REVENUE_TM})", 100)}
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a disjunction of conjunctive
    brand/size/quantity envelopes (container and shipmode, absent from
    the reduced schema, are dropped from each conjunct).

    Scale: the disjunction straddles both tables, so it can only be
    evaluated post-join — but its table-local weakenings ARE pushed:
    Catalyst derives p_brand IN (...) / p_size <= 15 on the part scan
    and l_quantity BETWEEN 1 AND 30 on the lineitem scan from the OR,
    shrinking the join inputs before the broadcast.
    """
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    env = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    # r8 exact-cents single-group sum (functions/money.py)
    return joined.filter(env).agg(
        money.dollars(money.sum128(money.revenue_tm()), 100).alias("revenue")
    )


@query(
    "q20_promotion_suppliers",
    """
    SELECT s_name, s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_13'
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > 30
      )
    ORDER BY s_name, s_suppkey
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who moved significant
    volume of a named part family — nested IN subqueries with a grouped
    HAVING inside (shipped volume > 50 stands in for the partsupp
    availqty comparison).

    Scale: innermost IN is a broadcast semi join of lineitem against the
    LIKE-filtered part keys; the HAVING aggregates to (suppkey, partkey)
    grain before the outer semi join, so the probe into supplier is
    tiny; nation broadcasts.
    """
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_13")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    movers = (
        l.join(F.broadcast(p.select("p_partkey")),
               l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


@query(
    "q22_sales_opportunity",
    f"""
    SELECT n_name AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
           {money.sql_dollars(f"SUM({money.sql_cents('c_acctbal')})", 1)}
               AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE {money.sql_cents('c_acctbal')}
            * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT CAST(SUM({money.sql_cents('c_acctbal')}) AS BIGINT)
             FROM customer WHERE c_acctbal > 0.0)
      AND n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7',
                     'NATION_9', 'NATION_11', 'NATION_13')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntry
    ORDER BY cntry
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded customers who never ordered, by country
    (nation stands in for the missing phone-prefix country code).

    Shape: uncorrelated scalar subquery (average positive balance) as a
    filter bound, plus predicated NOT EXISTS against the fact table
    (no-urgent-order stands in for never-ordered: the synthetic data
    gives every customer at least one order).

    Scale: the scalar average is a one-row broadcast, not a driver
    round-trip; NOT EXISTS is an anti join probing customer (the small
    side) against distinct order custkeys; both sides of the anti join
    are column-pruned to the key.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_3", "NATION_5", "NATION_7",
            "NATION_9", "NATION_11", "NATION_13",
        )
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    # r8 exact form (functions/money.py): the average-balance cut is a
    # cross-multiplied integer comparison (cents·n > Σcents) — a
    # drifting double average could flip customers sitting an ulp from
    # the cut; the per-country total is an exact cents sum.
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(money.cents("c_acctbal")).alias("__bal_sum"),
        F.count(F.lit(1)).alias("__bal_n"),
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(avg_bal))
        .filter(
            money.cents("c_acctbal") * F.col("__bal_n") > F.col("__bal_sum")
        )
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money.dollars(
                money.sum128(money.cents("c_acctbal")), 1
            ).alias("totacctbal"),
        )
        .orderBy("cntry")
    )
