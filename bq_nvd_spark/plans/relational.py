"""Relational query surface over the driver star schema.

Covers SURVEY.md §2 rows: J1 (anti join), J2-analog (semi join), J3
(equi/broadcast joins), A1 (scalar count), A4 (grouped aggregates,
distinct counts), §2.5 window functions, §2.6 sorts/limits/distinct,
§2.7 set ops, P4 (LIKE), P6 (LIMIT).

Scale notes (100 TB): every query here is a declarative plan — Catalyst
pushes filters into the parquet scan, prunes columns, and picks broadcast
hash joins for the dimension sides (region/nation/customer/supplier/part),
so the only shuffles left are the ones the semantics require (grouping on
the agg keys, sort-merge for fact-fact joins). AQE coalesces shuffle
partitions and splits skewed keys at runtime.

Float determinism: every computed float column is rounded identically in
the Spark plan and the oracle so the driver's value-hash is stable across
engines (summation order differs; the rounding absorbs the ulp noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# A4 / TPC-H Q1 shape: grouped aggregation with map-side partial aggregation.
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(30,10))), 2) AS DOUBLE)      AS sum_disc_price,
      FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(*) * 10000 + 0.5) / 10000                     AS avg_qty,
      FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(*) * 10000 + 0.5) / 10000                     AS avg_price,
      FLOOR(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(*) * 10000 + 0.5) / 10000                     AS avg_disc,
      COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every SUM runs over exact decimals (the measures are fixed-decimal
    values stored as doubles), so the aggregate is identical under ANY
    accumulation order — a float SUM's value would depend on partition
    merge order, which varies run to run. Averages divide the exact sum
    as a double (IEEE division is order-free) and fix the rounding rule
    with floor(x*1e4+0.5), never engine ROUND."""
    li = load_table(spark, sf_dir, "lineitem")

    def dec_sum(col: str) -> Column:
        return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")

    def fixed_avg(col: str) -> Column:
        return F.floor(dec_sum(col) / F.count(F.lit(1)) * 10000 + 0.5) / 10000

    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            fixed_avg("l_quantity").alias("avg_qty"),
            fixed_avg("l_extendedprice").alias("avg_price"),
            fixed_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J3 + top-k: fact-fact join, grouped revenue, deterministic top 10.
@query(
    "q3_top_revenue_orders",
    oracle="""
    SELECT
      o.o_orderkey,
      o.o_orderdate,
      CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            # Exact decimal sum: order-free, so the top-10 cut can't flip
            # between runs on last-ulp revenue drift.
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(30,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# J3 star join: 5-way join through the dimension chain, grouped by nation.
@query(
    "q5_revenue_by_nation",
    oracle="""
    SELECT
      n.n_name,
      CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(30,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# J1: left anti join — the reference pipeline's one real relational operator
# (bq_nvd/etl.py:80-92 does this as an O(n*m) driver-side membership loop;
# here it is a distributed broadcast anti-join, the 100 TB-safe formulation).
@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# J2 relational analog: EXISTS correlated subquery == left semi join.
@query(
    "semi_join_customers_with_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def semi_join_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# A1: scalar COUNT(col) — null-skipping count, the reference's bootstrap
# check (SELECT COUNT(cve.CVE_data_meta.ID) AS Count — bq_nvd/bq.py:125-127).
@query(
    "agg_count_scalar",
    oracle="SELECT COUNT(o_custkey) AS Count FROM orders",
)
def agg_count_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(F.count("o_custkey").alias("Count"))


# --------------------------------------------------------------------------
# A4: grouped multi-aggregate with exact distinct count.
@query(
    "group_agg_order_stats",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*)                              AS n_orders,
      COUNT(DISTINCT o_custkey)             AS n_customers,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(*) * 10000 + 0.5) / 10000 AS avg_price,
      ROUND(MIN(o_totalprice), 2)           AS min_price,
      ROUND(MAX(o_totalprice), 2)           AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def group_agg_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


# --------------------------------------------------------------------------
# P4/F3: LIKE predicate pushed into the parquet scan.
@query(
    "like_filter_parts",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%widget%'
    """,
)
def like_filter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%widget%")).select("p_partkey", "p_name", "p_brand")


# --------------------------------------------------------------------------
# F2: string normalization — regexp_replace + literal replace (the
# reference rewrites strings the same way during ETL, etl.py:72). Spark's
# regexp_replace is global by default; DuckDB needs the 'g' flag.
@query(
    "regex_normalize_parts",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           replace(p_brand, 'Brand#', 'B')             AS brand_code
    FROM part
    """,
)
def regex_normalize_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias(
            "brand_code"
        ),
    )


# --------------------------------------------------------------------------
# §2.6 + P6: global top-k — TakeOrderedAndProject, no full sort at scale.
@query(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# §2.6: DISTINCT.
@query(
    "distinct_market_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_market_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# --------------------------------------------------------------------------
# §2.5 window: ranking (row_number) per partition with deterministic order.
@query(
    "window_top3_customers_per_nation",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rnk
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    )
    WHERE rnk <= 3
    """,
)
def window_top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# --------------------------------------------------------------------------
# §2.5 window: analytic running total over an ordered frame.
@query(
    "window_running_order_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    WHERE o_custkey < 100
    """,
)
def window_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        # Decimal inside the frame: engines disagree on windowed-sum
        # accumulation order (segment trees vs sequential), which a float
        # running total would expose at rounding boundaries.
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


# --------------------------------------------------------------------------
# §2.7 set ops.
@query(
    "set_intersect_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_keys.intersect(done_keys)


@query(
    "set_except_custkeys",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    open_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.subtract(open_keys)


@query(
    "set_union_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    pending = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.union(pending).distinct()


# --------------------------------------------------------------------------
# J3 broadcast chain: orders per region through the nation/region
# constants (hinted) and the AQE-sized customer dim.
@query(
    "orders_per_region",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def orders_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# TPC-H q10 analog: returned-item revenue by customer — fact⋈fact⋈dim
# with a date-range filter, revenue agg, deterministic top 20.
@query(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(30,10))), 2) * 100
                AS BIGINT) AS revenue_cents,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1996-07-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join shuffles on orderkey; nation broadcasts (hinted
    constant), customer broadcasts by AQE size; the date filter pushes
    into the orders scan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(30,10)"
        )
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg((F.round(rev, 2) * 100).cast("bigint").alias("revenue_cents"))
        .select("c_custkey", "c_name", "revenue_cents", "nation")
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# §2.4 widening: PIVOT — order counts per market segment by priority.
# Spark's relational pivot vs the oracle's conditional aggregation.
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@query(
    "pivot_priority_by_segment",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) FILTER (o.o_orderpriority = '1-URGENT')        AS p1_urgent,
           COUNT(*) FILTER (o.o_orderpriority = '2-HIGH')          AS p2_high,
           COUNT(*) FILTER (o.o_orderpriority = '3-MEDIUM')        AS p3_medium,
           COUNT(*) FILTER (o.o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
           COUNT(*) FILTER (o.o_orderpriority = '5-LOW')           AS p5_low
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def pivot_priority_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pivot values keep the plan a single pass (no distinct-
    values pre-query) and pin the output schema for the oracle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    wide = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderpriority", list(_PRIORITIES))
        .agg(F.count(F.lit(1)))
    )
    renames = {
        "1-URGENT": "p1_urgent",
        "2-HIGH": "p2_high",
        "3-MEDIUM": "p3_medium",
        "4-NOT SPECIFIED": "p4_not_specified",
        "5-LOW": "p5_low",
    }
    out = wide
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # pivot leaves absent combinations null; the oracle's filtered COUNT
    # yields 0 — align.
    return out.select(
        "segment",
        *[F.coalesce(F.col(n), F.lit(0)).cast("long").alias(n) for n in renames.values()],
    )


# --------------------------------------------------------------------------
# §2.4 widening: UNPIVOT — the inverse, melting per-flag lineitem
# measures into (measure, value) rows via stack().
@query(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_linestatus, 'qty' AS measure,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
    FROM lineitem GROUP BY 1
    UNION ALL
    SELECT l_linestatus, 'price' AS measure,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
    FROM lineitem GROUP BY 1
    UNION ALL
    SELECT l_linestatus, 'discount' AS measure,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) * 100 AS BIGINT) AS total
    FROM lineitem GROUP BY 1
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.select(
        "l_linestatus",
        F.expr(
            "stack(3, 'qty', CAST(l_quantity AS DECIMAL(18,2)), "
            "'price', CAST(l_extendedprice AS DECIMAL(18,2)), "
            "'discount', CAST(l_discount AS DECIMAL(18,2))) AS (measure, value)"
        ),
    )
    return melted.groupBy("l_linestatus", "measure").agg(
        (F.sum("value") * 100).cast("bigint").alias("total")
    )


# --------------------------------------------------------------------------
# A4 + HAVING / TPC-H q18 shape: large orders — aggregate over the fact,
# HAVING threshold, join back for customer context.
@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS total_qty_x100
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2, 3
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 220
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING compiles to a post-aggregation filter; the fact-fact join
    shuffles once on orderkey, the customer dim broadcasts via AQE
    (no hint: customer grows with SF)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("total_qty_x100"),
        )
        .filter(F.col("_qty") > 220)
        .drop("_qty")
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery shape: each order vs its customer's average
# order value — decorrelated as a window over the customer partition
# (the 100 TB form: one shuffle on custkey, no per-row subquery).
@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey) AS cust_total
      FROM orders
    )
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n_orders > cust_total
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """price > group mean, compared as ``price*n > sum`` in exact
    decimals — no division and no float accumulation, so a price equal
    to its customer's exact mean is excluded identically in both
    engines (a float AVG could tip either way on summation order)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n_orders"),
            F.sum(price_dec).over(w).alias("cust_total"),
        )
        .filter(price_dec * F.col("n_orders") > F.col("cust_total"))
        .select(
            "o_orderkey",
            "o_custkey",
            (price_dec * 100).cast("bigint").alias("price_cents"),
        )
    )


# --------------------------------------------------------------------------
# A4 ordered-set aggregates: exact discrete percentiles per group.
@query(
    "order_price_quantiles",
    oracle="""
    SELECT o_orderpriority,
           CAST(CAST(quantile_disc(o_totalprice, 0.5) AS DECIMAL(18,2)) * 100
                AS BIGINT) AS median_cents,
           CAST(CAST(quantile_disc(o_totalprice, 0.9) AS DECIMAL(18,2)) * 100
                AS BIGINT) AS p90_cents
    FROM orders
    GROUP BY 1
    """,
)
def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per priority — the DISCRETE form, which returns
    an actual member of the group (verified identical element choice in
    Spark and DuckDB), so no interpolation arithmetic exists to drift at
    a half-cent boundary. A full sort within each group, which is why
    approx_percentile exists for the 100 TB path when exactness is
    negotiable."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        (
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
            .cast("decimal(18,2)")
            * 100
        )
        .cast("bigint")
        .alias("median_cents"),
        (
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
            .cast("decimal(18,2)")
            * 100
        )
        .cast("bigint")
        .alias("p90_cents"),
    )


# --------------------------------------------------------------------------
# A4 widening (round 9): CORPUS-GLOBAL exact percentiles, the shape
# percentile_disc cannot reach at scale — an ungrouped WITHIN GROUP
# sorts the whole relation through one task, exactly the plan
# operators/rank_select.py exists to kill. Five exact order statistics
# (p25/p50/p75/p90/p99, discrete: each an actual data element at rank
# ⌈p·n⌉) come from ONE stacked histogram-refinement selection — a
# count/min/max aggregate plus 1–3 map-side-combined cell-count scans
# over the fact table, no Window, no sort, any data volume.
@query(
    "order_price_percentiles_exact",
    oracle="""
    WITH v AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    r AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
             COUNT(*) OVER () AS n
      FROM v
    )
    SELECT p.pct,
           MAX(CASE WHEN r.rn = (p.num * r.n + 99) // 100
                    THEN r.cents END) AS cents
    FROM r CROSS JOIN (VALUES ('p25', 25), ('p50', 50), ('p75', 75),
                              ('p90', 90), ('p99', 99)) p(pct, num)
    GROUP BY p.pct
    """,
)
def order_price_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact price percentiles: the value at rank ⌈p·n⌉ of the
    cents-quantized total price, selected distributedly (no global
    sort; the oracle's ROW_NUMBER form picks the same tie-independent
    element)."""
    from bq_nvd_spark.operators.rank_select import exact_rank_values

    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    pcts = {"p25": 25, "p50": 50, "p75": 75, "p90": 90, "p99": 99}
    # (p·n + 99) // 100 ≥ 1 for every n ≥ 1, p ≥ 25 — textually
    # parallel to the oracle's unclamped rank formula
    cuts = exact_rank_values(
        o,
        "cents",
        lambda n: {k: (p * n + 99) // 100 for k, p in pcts.items()},
    ).get(None, {})
    return spark.createDataFrame(
        sorted((k, int(v)) for k, v in cuts.items()),
        "pct string, cents long",
    )


# --------------------------------------------------------------------------
# §2.7 multiset forms: INTERSECT ALL / EXCEPT ALL keep duplicate
# cardinalities (bag semantics), unlike their set-form siblings above.
@query(
    "bag_intersect_order_dates",
    oracle="""
    SELECT o_orderdate FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_orderdate FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def bag_intersect_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderdate")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_orderdate")
    return urgent.intersectAll(low)


@query(
    "bag_except_order_dates",
    oracle="""
    SELECT o_orderdate FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_orderdate FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def bag_except_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderdate")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_orderdate")
    return urgent.exceptAll(low)


# --------------------------------------------------------------------------
# §2.5 window: lag/lead — month-over-month revenue growth. Monthly revenue
# is summed as DECIMAL(18,2) in both engines (exact, order-free) and only
# cast to double at the end, so the lag subtraction is bit-deterministic;
# the first month's growth is NULL by lag semantics in both engines.
@query(
    "orders_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY 1
    )
    SELECT month, revenue,
           revenue - LAG(revenue) OVER (ORDER BY month) AS growth
    FROM monthly
    """,
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    # Single unpartitioned window over ~tens of month rows — the window
    # input is the AGGREGATED series, never the raw fact table, so the
    # one-partition sort is over |months|, not |orders|.
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("growth"),
    )


# --------------------------------------------------------------------------
# TPC-H q6 shape: the fully-pushable selective filter + single aggregate.
# Every predicate reaches the parquet scan; the revenue sums exact
# decimals (price×discount has 4 decimals — DECIMAL(30,10) recovers it).
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                              AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(30,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q12 shape: conditional aggregation — per return flag, how many
# lines belong to critical-priority orders vs not (CASE-sum buckets
# inside one grouped pass over the fact-fact join).
@query(
    "q12_priority_buckets",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q14 shape: promo-revenue share — a ratio of two exact decimal
# sums over an AQE-sized dim join (part grows with SF, so no hint). The division happens once, on doubles
# converted from exact sums, then floor-fixed — deterministic end to end.
@query(
    "q14_promo_share",
    oracle="""
    WITH j AS (
      SELECT CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))
               AS rev,
             p.p_type = 'PROMO' AS promo
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
        AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    )
    SELECT FLOOR(100.0 * CAST(SUM(CASE WHEN promo THEN rev ELSE 0 END)
                              AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE) * 10000 + 0.5) / 10000
             AS promo_pct,
           COUNT(*) AS n_lines
    FROM j
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    promo = F.col("p_type") == "PROMO"
    joined = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    return joined.agg(
        (
            F.floor(
                F.lit(100.0)
                * F.sum(F.when(promo, rev).otherwise(F.lit(0).cast("decimal(30,10)"))).cast("double")
                / F.sum(rev).cast("double")
                * 10000
                + 0.5
            )
            / 10000
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# TPC-H q4 shape: EXISTS decorrelated to a left-semi join with a compound
# (equi + inequality) condition. The driver lineitem carries no
# commit/receipt dates, so "late" is l_shipdate more than 30 days past
# the order date — same decorrelation, same plan shape (hash semi join
# on the equi key, the inequality evaluated as the join residual).
@query(
    "q4_late_order_priorities",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_late_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# TPC-H q13 shape: customers-per-order-count distribution — the outer
# join that must KEEP zero-order customers, with the filter in the join
# condition (not a WHERE, which would turn the outer join inner).
@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus"
    )
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderstatus") != "F"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H q17 shape: correlated average-quantity subquery, decorrelated to
# a per-part aggregate joined back to the fact. Quantities are whole
# numbers, so the per-part average is exact integer arithmetic in both
# engines and the 0.2× threshold comparison cannot drift.
@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT FLOOR(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0 * 100 + 0.5) / 100 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND p.p_type = 'MEDIUM'
      AND l.l_quantity < 0.2 * pq.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "MEDIUM")
    )
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (F.sum("l_quantity").cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.floor(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                        "double"
                    )
                    / 7.0
                    * 100
                    + 0.5
                )
                / 100
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q19 shape: disjunction of conjunctive brand/size/quantity bands.
# Catalyst pushes the OR-of-ANDs into both scans (part predicates to the
# part scan, quantity bounds to lineitem as `l_quantity BETWEEN min-all
# AND max-all`), then evaluates the exact disjunction as the join
# residual — the classic "predicate too wide to push whole" pattern.
@query(
    "q19_banded_brand_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 16 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 31 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_banded_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    def band(brand: str, size_lo: int, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            band("Brand#12", 1, 15, 1, 11)
            | band("Brand#23", 16, 30, 10, 20)
            | band("Brand#34", 31, 50, 20, 30)
        )
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q22 shape: scalar subquery (global average balance) + anti join
# (customers with no RECENT orders — every driver customer has lifetime
# orders, so the lapsed-window form keeps the result non-vacuous),
# grouped by nation. Balances are fixed to integer cents BEFORE any
# aggregate, so the average threshold and the reported totals are exact
# integer math in both engines — no float-sum order sensitivity at the
# comparison boundary.
@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH cents AS (
      SELECT c_custkey, c_nationkey,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
    ),
    threshold AS (
      SELECT CAST(SUM(bal_cents) AS DOUBLE) / COUNT(*) AS avg_cents
      FROM cents WHERE bal_cents > 0
    )
    SELECT c.c_nationkey, COUNT(*) AS n_custs,
           CAST(SUM(c.bal_cents) AS BIGINT) AS total_bal_cents
    FROM cents c, threshold t
    WHERE c.bal_cents > t.avg_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_cents"),
    )
    threshold = cents.filter(F.col("bal_cents") > 0).agg(
        (F.sum("bal_cents").cast("double") / F.count(F.lit(1))).alias(
            "avg_cents"
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cents.crossJoin(F.broadcast(threshold))
        .filter(F.col("bal_cents") > F.col("avg_cents"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
    )


# --------------------------------------------------------------------------
# §2.5 breadth: distribution-analytic window functions — NTILE bucket
# assignment and PERCENT_RANK — the "which tier is this row in"
# primitives of cohort/percentile analytics. Partitioned by nation so
# no global sort exists at any scale (the 100 TB version partitions by
# whatever unit the tiers are defined over); the order key is
# (integer cents, custkey), a total order, so tile boundaries and
# ranks are deterministic in both engines. PERCENT_RANK is
# (rank-1)/(rows-1) — one IEEE-exact divide — floor-fixed at 1e-6.
@query(
    "customer_balance_tiles",
    oracle="""
    WITH cents AS (
      SELECT c_nationkey, c_custkey,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
    ),
    t AS (
      SELECT c_nationkey, bal_cents,
             NTILE(4) OVER w AS tile,
             FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) / 1000000 AS pr
      FROM cents
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal_cents, c_custkey)
    )
    SELECT c_nationkey, tile,
           COUNT(*) AS n_custs,
           MIN(bal_cents) AS lo_cents,
           MAX(bal_cents) AS hi_cents,
           MAX(pr) AS max_pr
    FROM t
    GROUP BY c_nationkey, tile
    """,
)
def customer_balance_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cents = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_cents"),
    )
    w = Window.partitionBy("c_nationkey").orderBy("bal_cents", "c_custkey")
    t = cents.select(
        "c_nationkey",
        "bal_cents",
        F.ntile(4).over(w).alias("tile"),
        (F.floor(F.percent_rank().over(w) * 1_000_000 + 0.5) / 1_000_000).alias(
            "pr"
        ),
    )
    return t.groupBy("c_nationkey", "tile").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.min("bal_cents").alias("lo_cents"),
        F.max("bal_cents").alias("hi_cents"),
        F.max("pr").alias("max_pr"),
    )


# --------------------------------------------------------------------------
# TPC-H q7 shape: volume shipping between two nations — the
# two-role-aliases pattern (nation joined TWICE, as supplier nation and
# customer nation) with a symmetric disjunction over the pair, grouped
# by direction and year. Both nation sides broadcast; the disjunction
# evaluates as a join residual after the equi keys.
@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             EXTRACT(year FROM l.l_shipdate) AS yr,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(30,10)) AS vol
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("yr")
        )
        .agg(
            F.round(F.sum(vol), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q8 shape: national market share — a conditional-fraction
# aggregate (CASE-summed numerator over the total) across a 6-join
# star+snowflake chain through region. Both sums are exact
# DECIMAL(30,10); only the final ratio goes to double (one divide, one
# floor-fix — both IEEE-exact-rounded, so the engines agree).
@query(
    "q8_market_share",
    oracle="""
    SELECT yr,
           FLOOR(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                               ELSE CAST(0 AS DECIMAL(30,10)) END) AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE) * 1000000 + 0.5) / 1000000
             AS mkt_share,
           COUNT(*) AS n_lines
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
             ns.n_name AS supp_nation,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(30,10)) AS vol
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
                     AND r.r_name = 'AFRICA'
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      WHERE p.p_type = 'ECONOMY'
    )
    GROUP BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    zero = F.lit(0).cast("decimal(30,10)")
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            (
                F.floor(
                    num.cast("double") / F.sum(vol).cast("double") * 1_000_000
                    + 0.5
                )
                / 1_000_000
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q21 shape: suppliers who kept waiting multi-supplier orders —
# the double-correlated EXISTS + NOT-EXISTS self-join on the fact
# table, decorrelated to a semi join (some OTHER supplier contributed
# to the order) followed by an anti join (no OTHER supplier was ALSO
# late). The driver lineitem has no commit/receipt dates, so "late" is
# shipped more than 60 days after the order date (q4's convention).
# Both probes shuffle on l_orderkey only — the inequality on suppkey
# and the lateness predicate evaluate as join residuals.
@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
                    AND n.n_name = 'NATION_4'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_4"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > late_cut)
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3_key"),
        F.col("l_suppkey").alias("s3_key"),
        F.col("l_shipdate").alias("ship3"),
    )
    return (
        l1.join(
            l2,
            (F.col("o2_key") == F.col("l_orderkey"))
            & (F.col("s2_key") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o3_key") == F.col("l_orderkey"))
            & (F.col("s3_key") != F.col("l_suppkey"))
            & (F.col("ship3") > late_cut),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# TPC-H q2 shape: minimum-cost supplier — the correlated-MIN subquery
# ("the supplier whose cost equals the per-part minimum"), decorrelated
# to a window MIN over the part key. The driver schema has no partsupp,
# so supply cost is the minimum observed unit price (extendedprice /
# quantity) each supplier ever shipped the part at — same correlated
# shape, observable from the fact table. MIN is order-free, so the
# double unit price is deterministic under any partitioning; the
# equality probe compares the identical double on both engines.
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'LARGE' AND p.p_size < 15
      GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, c.l_partkey AS p_partkey,
           FLOOR(c.unit_cost * 10000 + 0.5) / 10000 AS unit_cost
    FROM cost c
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
                   AND r.r_name = 'EUROPE'
    WHERE c.unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                         WHERE c2.l_partkey = c.l_partkey)
    ORDER BY s.s_acctbal DESC, p_partkey, s.s_name
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # Per-(part, supplier) observed minimum unit price; one shuffle on
    # the composite key, map-side partial MIN combines first.
    cost = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # Decorrelated correlated-MIN: window MIN over the part key reuses
    # the groupBy's hash partitioning on l_partkey (no extra shuffle of
    # the fact-side relation, unlike a self-join against a re-agg).
    per_part_min = F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    best = cost.withColumn("part_min", per_part_min).filter(
        F.col("unit_cost") == F.col("part_min")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        best.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            (F.floor(F.col("unit_cost") * 10000 + 0.5) / 10000).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# TPC-H q9 shape: product-type profit by nation and year — LIKE filter
# on the part name, a 4-way join through supplier to nation, and a
# signed measure (revenue minus cost). The driver schema has no
# ps_supplycost, so cost is modeled as 60% of the part's retail price
# per unit shipped. The subtraction runs in exact DECIMAL(30,10) (the
# double inner arithmetic is bit-identical on both engines; the sum of
# decimals is order-free under reshuffling).
@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS yr,
           CAST(ROUND(SUM(CAST(
             l.l_extendedprice * (1 - l.l_discount)
             - p.p_retailprice * l.l_quantity * 0.6
             AS DECIMAL(30,10))), 2) AS DOUBLE) AS profit_amount,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY nation, yr
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.6
    ).cast("decimal(30,10)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.round(F.sum(profit), 2).cast("double").alias("profit_amount"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q11 shape: important parts — a HAVING clause against a scalar
# aggregate of the SAME relation (per-part value > fraction of total
# value). The scalar side reduces to ONE row and joins back as a
# broadcast nested-loop against the grouped relation — the fact table
# is scanned once, shuffled once on l_partkey; the total is the sum of
# the already-grouped per-part decimals, not a second fact scan.
@query(
    "q11_important_parts",
    oracle="""
    WITH partval AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(30,10))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
                     AND r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(ROUND(val, 2) * 100 AS BIGINT) AS value_cents
    FROM partval
    WHERE val > (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) * 1.5 FROM partval)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    from bq_nvd_spark.operators.checkpoint import stage_checkpoint

    # Materialize the grouped relation ONCE: it feeds both the scalar
    # cutoff and the filtered output, and without the checkpoint Spark
    # replays the fact scan + three joins + groupBy for each consumer.
    partval = stage_checkpoint(
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
    )
    # Scalar threshold: one-row aggregate of the grouped relation,
    # broadcast back (never a re-scan of lineitem). Scale-free cutoff
    # (1.5x the mean per-part value) so the predicate selects a stable
    # fraction at any corpus size, unlike TPC-H's fixed share which
    # empties out as |parts| grows. Exact decimal sum -> one IEEE
    # divide -> one multiply: bit-identical on both engines.
    total = partval.agg(
        (F.sum("val").cast("double") / F.count(F.lit(1)) * 1.5).alias("cutoff")
    )
    return (
        partval.join(F.broadcast(total))
        .filter(F.col("val") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            # Round to cents BEFORE the integer cast: the scale-10 sum
            # keeps a sub-cent fraction, and DuckDB's decimal->int cast
            # rounds where Spark's truncates — rounding first makes the
            # *100 product integer-valued so both casts agree.
            (F.round(F.col("val"), 2) * 100).cast("bigint").alias("value_cents"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q15 shape: top supplier — a derived revenue relation consumed
# twice: once for its MAX (one row) and once filtered to the argmax
# rows. Decimal revenue makes the MAX and the equality probe exact, so
# ties (all argmax suppliers) surface identically on both engines.
@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,10))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(rev.total_rev, 2) AS DOUBLE) AS total_rev
    FROM revenue rev
    JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    from bq_nvd_spark.operators.checkpoint import stage_checkpoint

    # The revenue relation feeds both the one-row MAX and the argmax
    # filter — materialize once instead of re-scanning lineitem.
    rev = stage_checkpoint(
        li.groupBy("l_suppkey").agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,10)"
                )
            ).alias("total_rev")
        )
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_rev"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H q16 shape: supplier census per part attribute triple — a
# NOT-IN exclusion (suppliers in deficit, the "complaints" analog)
# turned into an AQE-sized anti join, then COUNT(DISTINCT) per
# (brand, type, size). The distinct runs as a two-stage hash aggregate
# (partial distinct map-side), so the Zipfian brand skew never
# concentrates raw rows on one reducer.
@query(
    "q16_supplier_part_census",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24))
    )
    deficit = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            deficit,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# TPC-H q20 shape: suppliers with excess shipped volume of a named
# part family — the nested IN chain (supplier IN (... partkey IN
# (...) HAVING SUM(qty) > cutoff)) decorrelated to an aggregate-then-
# semi-join pipeline. The inner aggregate shuffles on the composite
# (suppkey, partkey); the outer probe is a semi join of the (small,
# AQE-sized) qualifying supplier-key set against the region-filtered
# supplier dim.
@query(
    "q20_excess_volume_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
               AND r.r_name = 'ASIA'
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
                 AND p.p_name LIKE 'red%'
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 40
    )
    """,
)
def q20_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    excess = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            excess,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# §2.5 widening: RANGE-framed window — a trailing 90-day revenue sum
# per customer, where the frame is defined by the ORDER-BY VALUE
# (days), not by row positions: all orders inside the sliding interval
# contribute, however many rows share a date. Both engines order by
# the same integer day number so frame membership is integer-exact;
# the framed sum is decimal cents (engines disagree on windowed-sum
# accumulation order, which a float would expose).
#
# Scale shape: one shuffle on o_custkey; within each partition the
# range frame evaluates in a single sorted pass. No global sort exists.
@query(
    "orders_trailing_90d_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day_no,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS trailing_90d_cents
    FROM orders
    WHERE o_custkey < 300
    """,
)
def orders_trailing_90d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_no)
        .rangeBetween(-90, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        day_no.alias("day_no"),
        # Cents via the scale-2 decimal (never double*100 -> int: the
        # product carries float noise and the engines' int casts
        # disagree on round-vs-truncate).
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .over(w)
        .alias("trailing_90d_cents"),
    )


# --------------------------------------------------------------------------
# §2.3 completion: FULL OUTER join — the reconciliation shape (compare
# two derived relations keyed the same way, keeping keys exclusive to
# either side). Order activity vs ship activity per calendar day: ship
# dates extend past the last order date, so the right side contributes
# unmatched keys and the null-side coalescing is exercised for real.
# Scale: both inputs are already-aggregated day-level relations (tiny),
# so the outer join is a hash join of two small sides — the pattern for
# reconciling two 100 TB fact tables is identical: aggregate each to
# the reconciliation grain FIRST, then outer-join the summaries.
@query(
    "full_outer_daily_activity",
    oracle="""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
      FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(o.d, s.d) AS day,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_ships, 0) AS n_ships
    FROM o FULL OUTER JOIN s ON o.d = s.d
    """,
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    s = lineitem.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_ships")
    )
    joined = o.withColumnRenamed("d", "od").join(
        s.withColumnRenamed("d", "sd"),
        F.col("od") == F.col("sd"),
        "full_outer",
    )
    return joined.select(
        F.coalesce("od", "sd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
    )


# --------------------------------------------------------------------------
# §2.5 widening: RFM segmentation — the canonical warehouse customer
# scoring (recency / frequency / monetary quartiles → a 3-digit
# segment code). All three metrics are exact (a date, a count, cents).
#
# Quartiles are VALUE-based: the cutoff for quartile k is the exact
# value at ascending rank ⌈k·n/4⌉, and a customer's bucket is
# 1 + (#cutoffs its value exceeds) — ties share a bucket, the
# standard scalable definition. The earlier row-based NTILE(4) form
# needed three un-partitioned global-sort windows (the whole customer
# relation through ONE task, three times — the worst plan shape in
# the repo at 10⁹ customers); the cutoffs now come from
# operators/rank_select.exact_rank_values — per metric, one min/max/
# count aggregate plus 1–3 histogram-refinement scans, every pass
# map-side combined, no Window and no global sort anywhere in the
# plan (pinned by tests/test_rank_select.py). The customer-grain
# aggregate is stage_checkpointed so the cutoff scans and the final
# projection share one materialization of the orders rollup, and all
# nine cutoffs come from ONE stacked selector call (shared scans).
@query(
    "customer_rfm_segments",
    oracle="""
    WITH m AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    -- each metric ranks its NON-NULL values only (the engine's rank
    -- selector drops NULLs per metric before computing n and ranks; an
    -- all-NULL customer must not shift another metric's cutoffs). The
    -- VALUE at rank ⌈k·n/4⌉ is tie-break independent, so the arbitrary
    -- ROW_NUMBER tie order cannot change a cutoff.
    cutr AS (
      SELECT
        MAX(CASE WHEN rr = (1*n + 3) // 4 THEN last_order END) AS cr1,
        MAX(CASE WHEN rr = (2*n + 3) // 4 THEN last_order END) AS cr2,
        MAX(CASE WHEN rr = (3*n + 3) // 4 THEN last_order END) AS cr3
      FROM (SELECT last_order,
                   ROW_NUMBER() OVER (ORDER BY last_order) AS rr,
                   COUNT(*) OVER () AS n
            FROM m WHERE last_order IS NOT NULL)
    ),
    cutf AS (
      SELECT
        MAX(CASE WHEN rf = (1*n + 3) // 4 THEN n_orders END) AS cf1,
        MAX(CASE WHEN rf = (2*n + 3) // 4 THEN n_orders END) AS cf2,
        MAX(CASE WHEN rf = (3*n + 3) // 4 THEN n_orders END) AS cf3
      FROM (SELECT n_orders,
                   ROW_NUMBER() OVER (ORDER BY n_orders) AS rf,
                   COUNT(*) OVER () AS n
            FROM m WHERE n_orders IS NOT NULL)
    ),
    cutm AS (
      SELECT
        MAX(CASE WHEN rm = (1*n + 3) // 4 THEN cents END) AS cm1,
        MAX(CASE WHEN rm = (2*n + 3) // 4 THEN cents END) AS cm2,
        MAX(CASE WHEN rm = (3*n + 3) // 4 THEN cents END) AS cm3
      FROM (SELECT cents,
                   ROW_NUMBER() OVER (ORDER BY cents) AS rm,
                   COUNT(*) OVER () AS n
            FROM m WHERE cents IS NOT NULL)
    ),
    cut AS (SELECT * FROM cutr, cutf, cutm)
    SELECT custkey, last_order, n_orders, cents, r, f, mo,
           CAST(r * 100 + f * 10 + mo AS BIGINT) AS segment
    FROM (
      SELECT m.custkey, m.last_order, m.n_orders, m.cents,
             CAST(1 + (CASE WHEN m.last_order > c.cr1 THEN 1 ELSE 0 END)
                    + (CASE WHEN m.last_order > c.cr2 THEN 1 ELSE 0 END)
                    + (CASE WHEN m.last_order > c.cr3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS r,
             CAST(1 + (CASE WHEN m.n_orders > c.cf1 THEN 1 ELSE 0 END)
                    + (CASE WHEN m.n_orders > c.cf2 THEN 1 ELSE 0 END)
                    + (CASE WHEN m.n_orders > c.cf3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f,
             CAST(1 + (CASE WHEN m.cents > c.cm1 THEN 1 ELSE 0 END)
                    + (CASE WHEN m.cents > c.cm2 THEN 1 ELSE 0 END)
                    + (CASE WHEN m.cents > c.cm3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS mo
      FROM m CROSS JOIN cut c
    )
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM quartiles and the combined segment code
    (recency·100 + frequency·10 + monetary); quartile cutoffs are the
    exact values at ranks ⌈k·n/4⌉, selected distributedly (no global
    sort), and ties on a cutoff value share the lower bucket."""
    from bq_nvd_spark.operators.checkpoint import stage_checkpoint
    from bq_nvd_spark.operators.rank_select import exact_rank_values

    orders = load_table(spark, sf_dir, "orders")
    m = stage_checkpoint(
        orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("bigint")
            ).alias("cents"),
        )
        # integer twin of last_order for the rank selector; monotone
        # bijective with the date, so date comparisons == day comparisons
        .withColumn("last_days", F.datediff("last_order", F.lit("1970-01-01")))
    )
    quartile_ranks = lambda n: {  # noqa: E731 — value at rank ⌈k·n/4⌉
        str(k): (k * n + 3) // 4 for k in (1, 2, 3)
    }
    # ONE stacked selector call for all nine cutoffs: unpivoting the
    # three metrics into (metric, v) rows and grouping by metric shares
    # the stats pass and every refinement scan across metrics (three
    # separate calls would serialize ~3× the driver round-trips).
    stacked = m.select(
        F.expr(
            "stack(3, 'last_days', CAST(last_days AS BIGINT),"
            " 'n_orders', n_orders, 'cents', cents) AS (metric, v)"
        )
    )
    cuts = exact_rank_values(stacked, "v", quartile_ranks, group_col="metric")

    def bucket(col: str, c: dict):
        b = F.lit(1)
        for k in ("1", "2", "3"):
            # empty orders => no cutoffs; the relation is empty so the
            # literal fallback never reaches a row
            b = b + F.when(F.col(col) > F.lit(c.get(k, 0)), 1).otherwise(0)
        return b.cast("long")

    return m.select(
        "custkey",
        "last_order",
        "n_orders",
        "cents",
        bucket("last_days", cuts.get("last_days", {})).alias("r"),
        bucket("n_orders", cuts.get("n_orders", {})).alias("f"),
        bucket("cents", cuts.get("cents", {})).alias("mo"),
    ).select(
        "*",
        (F.col("r") * 100 + F.col("f") * 10 + F.col("mo"))
        .cast("long")
        .alias("segment"),
    )
