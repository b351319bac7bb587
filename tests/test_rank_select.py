"""exact_rank_values: distributed order statistics vs sorted() truth,
and the plan-shape pin that keeps the two rescued queries free of
un-partitioned (single-task) Window sorts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bq_nvd_spark.operators.rank_select import exact_rank_values


def _truth(values, rank):
    return sorted(values)[rank - 1]


def test_ungrouped_matches_sorted_truth(spark):
    rng = random.Random(7)
    vals = [rng.randint(-(10**12), 10**12) for _ in range(500)]
    vals += [vals[0]] * 25  # heavy ties on one value
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    n = len(vals)
    ranks = {"min": 1, "q1": (n + 3) // 4, "med": (n + 1) // 2, "max": n}
    got = exact_rank_values(df, "v", lambda m: ranks)[None]
    for label, rk in ranks.items():
        assert got[label] == _truth(vals, rk), label


def test_grouped_matches_sorted_truth(spark):
    rng = random.Random(11)
    rows = []
    per_group = {}
    for g in ("a", "b", "c"):
        vs = [rng.randint(0, 10**6) for _ in range(rng.randint(3, 80))]
        per_group[g] = vs
        rows += [(g, v) for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = exact_rank_values(
        df, "v", lambda n: {"med": (n + 1) // 2}, group_col="g"
    )
    for g, vs in per_group.items():
        assert got[g]["med"] == _truth(vs, (len(vs) + 1) // 2), g


def test_single_value_and_tiny_spans_short_circuit(spark):
    df = spark.createDataFrame([(5,), (5,), (5,)], "v long")
    got = exact_rank_values(df, "v", lambda n: {"m": (n + 1) // 2})
    assert got[None]["m"] == 5


def test_narrow_buckets_force_multiple_refinement_rounds(spark):
    # tiny n_buckets on a wide zero-straddling span exercises the
    # iterative descent (incl. the double-width k=0 cell) over many
    # rounds; n_buckets below the progress-guarantee floor is clamped
    vals = list(range(-497, 503, 7))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for nb in (2, 4, 5):
        got = exact_rank_values(
            df, "v", lambda n: {"med": (n + 1) // 2}, n_buckets=nb
        )
        assert got[None]["med"] == _truth(vals, (len(vals) + 1) // 2)


def test_full_int64_span_does_not_overflow(spark):
    """Values straddling the int64 extremes (the shape of xxhash64 /
    simhash columns): span exceeds 2^63, where a lo-anchored bucket
    expression would raise ARITHMETIC_OVERFLOW under ANSI mode (and
    silently misbucket with ANSI off)."""
    lo, hi = -(2**63), 2**63 - 1
    vals = [lo, lo + 1, -(2**62), -12345, -1, 0, 1, 7, 2**62, hi - 1, hi]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    n = len(vals)
    ranks = {"min": 1, "q": n // 3, "med": (n + 1) // 2, "max": n}
    got = exact_rank_values(df, "v", lambda m: ranks)[None]
    for label, rk in ranks.items():
        assert got[label] == _truth(vals, rk), label


def test_random_extreme_spans_match_truth(spark):
    rng = random.Random(23)
    vals = [rng.randint(-(2**63), 2**63 - 1) for _ in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    n = len(vals)
    ranks = {str(k): max(1, k * n // 7) for k in range(1, 8)}
    got = exact_rank_values(df, "v", lambda m: ranks)[None]
    for label, rk in ranks.items():
        assert got[label] == _truth(vals, rk), label


def test_out_of_range_rank_raises(spark):
    df = spark.createDataFrame([(1,), (2,)], "v long")
    with pytest.raises(ValueError, match="out of"):
        exact_rank_values(df, "v", lambda n: {"bad": n + 1})


def _logical_window_partition_sizes(df):
    """Partition-spec arity of every Window node in the optimized
    logical plan (the logical plan is AQE-independent, unlike
    executedPlan)."""
    sizes = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            sizes.append(node.partitionSpec().size())
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    return sizes


@pytest.mark.parametrize(
    "name", ["customer_rfm_segments", "value_mad_outliers"]
)
def test_rescued_queries_have_no_unpartitioned_window(spark, sf_dir, name):
    """The round-7 verdict's two worst scale shapes: three global-sort
    NTILE windows (RFM) and two ~5-key partition sorts of the fact
    table (MAD). Both now select ranks via histogram refinement; pin
    that NO un-partitioned Window ever returns to these plans."""
    from bq_nvd_spark.plans import QUERIES

    df = QUERIES[name](spark, sf_dir)
    assert all(s > 0 for s in _logical_window_partition_sizes(df))


def test_rfm_buckets_match_ntile_on_distinct_values(spark):
    """On an all-distinct metric with n divisible by 4, value-based
    quartiles coincide with row-based NTILE(4) — the semantics change
    only collapses ties (and shifts ⌈k·n/4⌉-vs-NTILE remainder
    placement when 4 ∤ n)."""
    from pyspark.sql.window import Window

    vals = random.Random(3).sample(range(10**6), 200)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    cuts = exact_rank_values(
        df, "v", lambda n: {str(k): (k * n + 3) // 4 for k in (1, 2, 3)}
    )[None]
    bucket = F.lit(1)
    for k in ("1", "2", "3"):
        bucket = bucket + F.when(F.col("v") > F.lit(cuts[k]), 1).otherwise(0)
    got = {
        (r["v"], r["b"])
        for r in df.select("v", bucket.alias("b")).collect()
    }
    want = {
        (r["v"], r["nt"])
        for r in df.select(
            "v", F.ntile(4).over(Window.orderBy("v")).alias("nt")
        ).collect()
    }
    assert got == want


def test_weighted_selection_matches_expanded_multiset(spark):
    """weight_col: (value, count) census rows must select identically
    to the expanded multiset — the census fast path's correctness."""
    rng = random.Random(42)
    census = [
        (g, v, rng.randint(1, 9))
        for g in ("x", "y")
        for v in rng.sample(range(-(10**6), 10**6), 40)
    ]
    df = spark.createDataFrame(census, "g string, v long, w long")
    got = exact_rank_values(
        df,
        "v",
        lambda n: {"med": (n + 1) // 2, "p90": max(1, (9 * n + 9) // 10)},
        group_col="g",
        weight_col="w",
    )
    for g in ("x", "y"):
        expanded = sorted(
            v for gg, v, w in census if gg == g for _ in range(w)
        )
        n = len(expanded)
        assert got[g]["med"] == expanded[(n + 1) // 2 - 1]
        assert got[g]["p90"] == expanded[max(1, (9 * n + 9) // 10) - 1]


def test_bad_weights_fail_loudly(spark):
    """Zero, negative, and NULL weights violate the positive-integer
    weight contract and must raise immediately (they would otherwise
    silently skew n and every rank)."""
    import pytest

    from bq_nvd_spark.operators.rank_select import exact_rank_values

    med = lambda n: {"med": (n + 1) // 2}  # noqa: E731
    for bad in (0, -3):
        df = spark.createDataFrame(
            [(1, 2), (5, bad), (9, 1)], "v long, w long"
        )
        with pytest.raises(ValueError, match="positive integers"):
            exact_rank_values(df, "v", med, weight_col="w")
    null_w = spark.createDataFrame(
        [(1, 2), (5, None), (9, 1)], "v long, w long"
    )
    with pytest.raises(ValueError, match="NULL weights"):
        exact_rank_values(null_w, "v", med, weight_col="w")
    # the unweighted path is unaffected by a bad column lying around
    got = exact_rank_values(null_w, "v", med)
    assert got[None]["med"] == 5


def test_live_target_cap_fails_loudly(spark):
    """A high-cardinality group_col must raise, not crawl: each
    refinement scan does O(rows x targets) work by design."""
    import pytest

    from bq_nvd_spark.operators.rank_select import exact_rank_values

    df = spark.createDataFrame(
        [(g, v) for g in range(40) for v in (1, 10**9 + g)],
        "g long, v long",
    )
    with pytest.raises(ValueError, match="max_targets"):
        exact_rank_values(
            df, "v", lambda n: {"med": (n + 1) // 2},
            group_col="g", max_targets=10,
        )
    # raising the cap deliberately still works
    got = exact_rank_values(
        df, "v", lambda n: {"med": (n + 1) // 2},
        group_col="g", max_targets=40,
    )
    assert len(got) == 40 and got[0]["med"] == 1


def test_rfm_null_metric_customers_match_oracle(spark, tmp_path):
    """ADVICE r9: a customer whose o_totalprice (or o_orderdate) values
    are all NULL must not shift another metric's quartile cutoffs — the
    engine's rank selector drops NULL metric values, and the oracle now
    ranks each metric's non-null values only. Hostile fixture: all-NULL
    date customers, all-NULL price customers, mixed-NULL customers."""
    import datetime

    import duckdb

    from bq_nvd_spark.oracle_compare import rowset
    from bq_nvd_spark.plans import ORACLES, QUERIES

    rows = []
    d0 = datetime.datetime(1995, 1, 1)
    for ck in range(1, 21):
        for j in range(ck % 3 + 1):
            date = None if ck % 5 == 0 else d0 + datetime.timedelta(
                days=ck * 7 + j
            )
            price = None if ck % 4 == 0 else float(100 * ck + j)
            if ck == 13 and j == 0:
                price = None  # mixed: some NULL some not within a customer
            rows.append((ck * 10 + j, ck, "O", price, date, "1-URGENT"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )

    sdf = QUERIES["customer_rfm_segments"](spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    rel = con.sql(ORACLES["customer_rfm_segments"])
    assert sorted(sdf.columns) == sorted(rel.columns)
    s_norm = rowset(sdf.columns, [tuple(r) for r in sdf.collect()])
    d_norm = rowset(rel.columns, rel.fetchall())
    assert s_norm == d_norm


def test_fractional_weights_fail_loudly(spark):
    """A fractional weight (2.7) must fail the positive-integer
    contract, not silently truncate to 2 via the internal long cast."""
    import pytest

    from bq_nvd_spark.operators.rank_select import exact_rank_values

    df = spark.createDataFrame(
        [(1, 2.0), (5, 2.7), (9, 1.0)], "v long, w double"
    )
    with pytest.raises(ValueError, match="fractional"):
        exact_rank_values(
            df, "v", lambda n: {"med": (n + 1) // 2}, weight_col="w"
        )
    # integral-valued doubles are a fine weight carrier
    ok = spark.createDataFrame([(1, 2.0), (5, 3.0)], "v long, w double")
    got = exact_rank_values(
        ok, "v", lambda n: {"med": (n + 1) // 2}, weight_col="w"
    )
    assert got[None]["med"] == 5
