"""Behavioral invariants for the funnel / retention / sketch-rollup queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.plans.funnels import (
    funnel_conversion,
    hll_daily_rollup,
    weekly_retention_cohorts,
)
from bq_nvd_spark.sources.tables import load_table


def test_funnel_is_monotone(spark, sf_dir):
    r = funnel_conversion(spark, sf_dir).first()
    assert r["n_view_users"] >= r["n_view_then_click"] >= r["n_full_funnel"] >= 0
    assert r["n_view_users"] > 0  # fixture has view events


def test_retention_week0_equals_cohort_size(spark, sf_dir):
    """Every user is active in their own first week, so the offset-0 row
    of each cohort counts exactly the users whose first activity fell in
    that week."""
    rows = weekly_retention_cohorts(spark, sf_dir).collect()
    assert rows and all(r["week_offset"] >= 0 for r in rows)
    ev = load_table(spark, sf_dir, "events")
    cohort_sizes = {
        r["cohort_week"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.min("ts").alias("fts"))
        .select(F.date_trunc("week", "fts").cast("date").alias("cohort_week"))
        .groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    week0 = {r["cohort_week"]: r["n_active"] for r in rows if r["week_offset"] == 0}
    assert week0 == cohort_sizes
    # no offset row can exceed its cohort's size
    for r in rows:
        assert r["n_active"] <= cohort_sizes[r["cohort_week"]]


def test_hll_rollup_merge_equals_direct_sketch_bound(spark, sf_dir):
    rows = hll_daily_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rollup_within_bound"], r["event_type"]
