"""Nested-data query surface — the reference's centerpiece semantics.

The reference's flagship documented query (reference README.md:41-59) is a
doubly-nested ``EXISTS (SELECT ... FROM UNNEST(arr) WHERE ... LIKE ...)``
over arrays-of-structs (``configurations.nodes[].cpe_match[]``), plus
dotted-path projection through struct levels (``cve.CVE_data_meta.ID`` —
reference bq_nvd/bq.py:156-158). The driver's oracle tables are flat, so
these queries first build the nested shape (collect_list of structs — the
inverse of UNNEST), then exercise the exact operators: higher-order
``exists``/``filter``/``transform``/``aggregate``, ``explode``, and dotted
``col`` paths. HOF predicates evaluate per-row with NO shuffle — at 100 TB
this is why J2 compiles to a scan, not a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table


def _orders_with_item_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders + items: array<struct> per order — the nvd `configurations.nodes`
    shape. collect_list order is nondeterministic; consumers must be
    order-insensitive (exists/filter/size) or sort the array first."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_linenumber", "l_returnflag", "l_extendedprice", "l_quantity")
        ).alias("items")
    )
    orders = load_table(spark, sf_dir, "orders")
    return orders.join(items, orders.o_orderkey == items.l_orderkey, "left")


# --------------------------------------------------------------------------
# J2: EXISTS over an array-of-structs via higher-order function — the Spark
# port of the reference flagship (README.md:41-59: EXISTS + UNNEST + LIKE).
@query(
    "nested_exists_returned_items",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_returnflag = 'R' AND l.l_extendedprice > 4000
    )
    """,
)
def nested_exists_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = _orders_with_item_arrays(spark, sf_dir)
    return nested.filter(
        F.exists(
            "items",
            lambda it: (it["l_returnflag"] == "R") & (it["l_extendedprice"] > 4000),
        )
    ).select("o_orderkey", "o_totalprice")


# --------------------------------------------------------------------------
# J2 doubly-nested: customer -> orders[] -> items[] mirrors the reference's
# configurations.nodes[].cpe_match[] two-level EXISTS (README.md:41-59).
@query(
    "doubly_nested_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
        )
    )
    """,
)
def doubly_nested_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained LEFT SEMI joins — the scale-safe plan for two-level
    EXISTS. A nested-array build (collect_list per customer, then HOF
    exists) gives the same rows but materializes an unbounded array per
    key: OOM/skew bait at 100 TB. The single-level HOF form lives in
    nested_exists_returned_items; here the semi-join chain pushes the
    l_quantity filter into the lineitem scan and never widens a row."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    qualifying_orders = orders.join(
        li.filter(F.col("l_quantity") >= 49).select("l_orderkey"),
        orders.o_orderkey == F.col("l_orderkey"),
        "left_semi",
    )
    return cust.join(
        qualifying_orders.select("o_custkey"),
        cust.c_custkey == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# P2: dotted-path projection through struct levels with alias — the Spark
# port of SELECT cve.CVE_data_meta.ID AS ID (reference bq_nvd/bq.py:156-158).
@query(
    "nested_projection_dotted_path",
    oracle="SELECT c_name AS ID, c_mktsegment AS ASSIGNER FROM customer",
)
def nested_projection_dotted_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # Build the two-level struct (cve.CVE_data_meta.{ID,ASSIGNER} shape),
    # then project back out through dotted column paths.
    nested = cust.select(
        F.struct(
            F.struct(
                F.col("c_name").alias("ID"), F.col("c_mktsegment").alias("ASSIGNER")
            ).alias("CVE_data_meta")
        ).alias("cve")
    )
    return nested.select(
        F.col("cve.CVE_data_meta.ID").alias("ID"),
        F.col("cve.CVE_data_meta.ASSIGNER").alias("ASSIGNER"),
    )


# --------------------------------------------------------------------------
# A1 over a nested field: COUNT(struct.field) is null-skipping, like the
# reference's COUNT(cve.CVE_data_meta.ID) (bq_nvd/bq.py:125-127).
@query(
    "count_nested_field",
    oracle="SELECT COUNT(c_name) AS Count FROM customer",
)
def count_nested_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nested = cust.select(
        F.struct(F.col("c_name").alias("ID")).alias("CVE_data_meta")
    )
    return nested.agg(F.count("CVE_data_meta.ID").alias("Count"))


# --------------------------------------------------------------------------
# F7: explode == UNNEST round-trip — build arrays, UNNEST them back out,
# aggregate. Exercises explode (drops null/empty arrays, like BQ/DuckDB
# UNNEST of NULL yielding zero rows).
@query(
    "explode_unnest_roundtrip",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def explode_unnest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    arrays = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_returnflag")).alias("items")
    )
    exploded = arrays.select(F.explode("items").alias("item"))
    return exploded.groupBy(F.col("item.l_returnflag").alias("l_returnflag")).agg(
        F.count(F.lit(1)).alias("n_items")
    )


# --------------------------------------------------------------------------
# F7 HOFs: transform + aggregate (fold) over a sorted array — per-row
# computation with no shuffle beyond the array build. The filter stage
# became a ROW predicate in the r17 optimization round (it commutes with
# the group/sort, halves the exchange, and reaches the scan as a pushed
# filter); the filter-HOF form is pinned equivalent in
# tests/test_nested_plans.py, and F.filter itself stays exercised by the
# Gopher kernel and token-stat queries.
# Oracle mirrors the Spark plan EXACTLY: same linenumber sort, same
# filter, same sequential left-fold with 0.0 init (list_reduce over the
# 0.0-prepended list), and the same *rounding algorithm* —
# floor(x*100 + 0.5)/100 evaluates bit-identically in IEEE-754 doubles
# on both engines, whereas Spark's ROUND (BigDecimal on the exact double)
# and DuckDB's ROUND (round(x*100)/100) disagree at half-cent boundaries
# like 49574.424999999996 (x*100 lands exactly on ....5 in double).
@query(
    "hof_filter_transform_fold",
    oracle="""
    WITH arrays AS (
      SELECT l_orderkey,
             list_transform(
               list_filter(
                 list_sort(list(struct_pack(
                   ln := l_linenumber, q := l_quantity,
                   ep := l_extendedprice, d := l_discount))),
                 it -> it.q > 25),
               it -> it.ep * (1 - it.d)) AS vals
      FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           FLOOR(list_reduce(list_prepend(0.0, vals), (a, x) -> a + x)
                 * 100 + 0.5) / 100 AS high_value_revenue,
           CAST(len(vals) AS BIGINT) AS n_high
    FROM arrays
    WHERE len(vals) > 0
    """,
)
def hof_filter_transform_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # The q > 25 predicate commutes with the group/sort: filtering ROWS
    # before the groupBy yields the same qualifying-struct multiset per
    # order, and sort_array applies the same full-struct comparator to
    # it, so the array VALUE (hence the order-sensitive fold) is
    # identical to filtering inside the built array — while the
    # exchange ships only the ~50% qualifying rows. The struct keeps
    # all four fields: (l_orderkey, l_linenumber) is NOT unique in this
    # corpus, so the remaining fields are live sort tie-breaks.
    # No size > 0 guard needed: a group exists iff it has at least one
    # qualifying row, so the array is never empty (the oracle's
    # len(vals) > 0 serves ITS full-array-then-filter formulation).
    filtered = (
        li.filter(F.col("l_quantity") > 25)
        .groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
                    )
                )
            ).alias("high_items")
        )
    )
    # transform -> per-item discounted price; aggregate -> sequential fold;
    # floor(x*100+0.5)/100 is the cross-engine-deterministic 2-dp rounding.
    fold = F.aggregate(
        F.transform(
            "high_items",
            lambda it: it["l_extendedprice"] * (1 - it["l_discount"]),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return filtered.select(
        "l_orderkey",
        (F.floor(fold * 100 + 0.5) / 100).alias("high_value_revenue"),
        F.size("high_items").cast("long").alias("n_high"),
    )
