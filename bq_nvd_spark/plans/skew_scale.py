"""Skew-aware plan rewrites, demonstrated end-to-end (SURVEY §2.11 scale
notes: "key-salting on skew").

``events.event_type`` has 5 values — a worst-case shuffle key: every
join or state-heavy aggregation keyed on it funnels ~20% of the table
through single reducers. These queries run the salted rewrites from
``operators/skew.py``; results are semantically identical to the naive
plans, which is exactly what the DuckDB oracles (written naive) check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.operators.skew import salted_agg, salted_join
from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table

N_SALTS = 8


# --------------------------------------------------------------------------
# Salted join: events ⋈ a per-type dimension on the 5-value key.
@query(
    "salted_join_event_weights",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type, length(event_type) AS w FROM events
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(e.props, '$.k') AS BIGINT) * d.w)
                AS BIGINT) AS weighted_k
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def salted_join_event_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dimension here is broadcastable (5 rows) — the point is the
    mechanics: with a medium dim the same plan bounds each hot key to
    N_SALTS reducers instead of one. Integer weighted sum keeps the
    oracle hash exact."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().select(
        "event_type", F.length("event_type").alias("w")
    )
    joined = salted_join(
        ev, dim, ["event_type"], id_col="event_id", n_salts=N_SALTS
    )
    k = F.get_json_object("props", "$.k").cast("bigint")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k * F.col("w")).alias("weighted_k"),
    )


# --------------------------------------------------------------------------
# Salted two-stage aggregation: exact distinct users per hot key.
@query(
    "salted_distinct_users_per_type",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def salted_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count on a 5-value key with the BUILD spread over
    salts: per-(key, salt) ``collect_set`` partials, merged per key.
    Plain count/sum would not need this — distinct state is what
    refuses to combine map-side.

    Honest bound: the final merge's output row still holds the key's
    whole distinct set (array_distinct over the flattened partials),
    so this shape is for keyspaces whose PER-KEY distinct cardinality
    fits a row (~10⁷ longs). When it doesn't, exact distinct wants the
    array-free double aggregation instead — ``groupBy(key, user)`` then
    ``groupBy(key).count()`` — which is fully map-side combinable and
    needs no salt at all; this query keeps the salted form because
    demonstrating salting for genuinely non-combinable state is its
    point."""
    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev,
        ["event_type"],
        partial_aggs=[F.collect_set("user_id").alias("users")],
        final_aggs=[
            F.size(F.array_distinct(F.flatten(F.collect_list("users")))).cast(
                "long"
            ).alias("n_users")
        ],
        id_col="event_id",
        n_salts=N_SALTS,
    )


# --------------------------------------------------------------------------
# §2.4 widening: multi-resolution time rollup (hypertable-style).
@query(
    "rollup_orders_by_month",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)  AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mth,
           GROUPING(EXTRACT(year FROM o_orderdate),
                    EXTRACT(month FROM o_orderdate))        AS lvl,
           COUNT(*)                                         AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
    FROM orders
    GROUP BY ROLLUP(EXTRACT(year FROM o_orderdate),
                    EXTRACT(month FROM o_orderdate))
    """,
)
def rollup_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: month, year, and grand-total resolutions
    in one pass (Catalyst expands the grouping sets; partial aggregation
    still combines map-side). ``lvl`` is the grouping bit-vector —
    identical integer semantics in Spark and DuckDB. The float SUM is
    fixed to cents with floor(x*100+0.5) before hashing."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").alias("yr")
    mth = F.month("o_orderdate").alias("mth")
    return (
        orders.rollup(yr, mth)
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .select("yr", "mth", "lvl", "n_orders", "cents")
    )


# --------------------------------------------------------------------------
# §2.4 widening: CUBE — the full grouping-sets lattice (both margins +
# the cross + the grand total in one pass), where ROLLUP only walks the
# hierarchy. Same execution story: Catalyst expands the sets, partial
# aggregation combines map-side, and the expansion factor is the fixed
# 2^k of the (low-cardinality) cube dimensions, never data-dependent.
@query(
    "cube_status_priority_census",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS lvl,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS cents
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .select("o_orderstatus", "o_orderpriority", "lvl", "n_orders", "cents")
    )


# --------------------------------------------------------------------------
# §2.4 widening: explicit GROUPING SETS — the general form that ROLLUP
# and CUBE desugar to, with a hand-picked lattice (each single margin
# plus the grand total, but NOT the cross product — the set CUBE would
# add). Execution matches the other two: Catalyst expands the sets
# before the exchange and partial aggregation combines map-side, so
# the shuffle carries |input| x |sets| pre-combined rows at most.
@query(
    "grouping_sets_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS lvl,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .select("o_orderstatus", "o_orderpriority", "lvl", "n_orders", "cents")
    )
