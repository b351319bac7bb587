"""Pins for the plans/nested.py HOF query's round-17 pre-filter rewrite.

Oracle parity checks its value against DuckDB; these check (a) that the
row-level pre-filter form is bit-identical to the original
filter-inside-the-built-array form — the fold is a sequential float
sum, so even the ARRAY VALUE (element order included) must match — and
(b) that the predicate actually reaches the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.plans.nested import hof_filter_transform_fold
from bq_nvd_spark.sources.tables import load_table


def _naive_form(spark, sf_dir):
    # The pre-rewrite formulation: build the FULL per-order sorted
    # array, then filter elements inside it.
    li = load_table(spark, sf_dir, "lineitem")
    arrays = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
                )
            )
        ).alias("items")
    )
    filtered = arrays.select(
        "l_orderkey",
        F.filter("items", lambda it: it["l_quantity"] > 25).alias("high_items"),
    ).filter(F.size("high_items") > 0)
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


def test_hof_prefilter_matches_naive_array_filter(spark, sf_dir):
    got = {tuple(r) for r in hof_filter_transform_fold(spark, sf_dir).collect()}
    want = {tuple(r) for r in _naive_form(spark, sf_dir).collect()}
    assert got and got == want


def test_hof_prefilter_reaches_parquet_scan(spark, sf_dir):
    df = hof_filter_transform_fold(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(l_quantity,25.0)" in plan
