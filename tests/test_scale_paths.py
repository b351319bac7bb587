"""Scale-path mechanics that the oracle gate can't see directly:
watermark-driven window finalization in append mode, and bucketed
co-located joins that pre-exchange data at write time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _write_hours(tmp_path, name, hours):
    """One parquet file of events at the given hour marks (ts in
    epoch-micros timestamps; one event per (hour, user))."""
    base = 1_700_000_000  # fixed epoch anchor, second precision
    rows = [
        {"event_id": i, "ts": pd.Timestamp((base + h * 3600) * 10**9), "user_id": u}
        for i, (h, u) in enumerate(hours)
    ]
    path = str(tmp_path / name)
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(path)
    return path


def test_watermark_finalizes_windows_append_mode(spark, tmp_path):
    """Append-mode windowed agg with a watermark: only windows the final
    watermark has closed are emitted; still-open windows are withheld.

    Two staged files processed one per micro-batch: the second file's
    later timestamps advance the watermark past the first file's
    windows, finalizing them.
    """
    import tempfile

    stage = tmp_path / "stage"
    stage.mkdir()
    _write_hours(stage, "f1.parquet", [(0, 1), (0, 2), (1, 1)])
    _write_hours(stage, "f2.parquet", [(10, 1), (10, 2)])

    stream = (
        spark.readStream.schema("event_id LONG, ts TIMESTAMP, user_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{stage}/*.parquet")
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName("wm_windows")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {(r.ws, r.n) for r in spark.table("wm_windows").collect()}

    # Final watermark = max(ts) - 30min = hour-10 mark - 30min, which
    # closes the hour-0 and hour-1 windows but NOT the hour-10 window.
    batch = spark.read.parquet(f"{stage}/*.parquet")
    closed = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .orderBy("ws")
        .collect()
    )
    expected = {(r.ws, r.n) for r in closed[:-1]}  # all but the open last window
    assert got == expected
    assert len(got) == 2


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """Tables bucketed on the join key at write time join without any
    shuffle: the bucketed scan satisfies the join's distribution
    requirement, so the sort-merge join plans with zero Exchange nodes —
    the 'pay the shuffle once at write, never at read' contract."""
    sf = "/root/testdata/sf0.001"
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            spark.read.parquet(f"{sf}/orders.parquet")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable("orders_b")
        )
        (
            spark.read.parquet(f"{sf}/customer.parquet")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable("customer_b")
        )
        joined = (
            spark.table("orders_b")
            .join(
                spark.table("customer_b"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        # and the result is still correct
        naive = (
            spark.read.parquet(f"{sf}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf}/customer.parquet"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, naive.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_filter_and_projection_reach_the_scan(spark, sf_dir):
    """Predicate pushdown + column pruning: the LIKE filter lands in the
    parquet scan's PushedFilters and the ReadSchema carries only the
    projected columns — the difference between scanning kilobytes and
    scanning the lake at 100 TB."""
    from bq_nvd_spark.plans.relational import like_filter_parts

    df = like_filter_parts(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :]
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "p_name" in pushed and "Contains" in pushed or "StringContains" in pushed
    read_schema = scan.split("ReadSchema: ")[1].splitlines()[0]
    assert "p_name" in read_schema and "p_brand" in read_schema
    assert "p_retailprice" not in read_schema  # unused column pruned


def test_stream_stream_join_uses_symmetric_hash(spark, sf_dir):
    """The interval join compiles to Spark's stream-stream join operator
    (symmetric hash with watermarked state), not to a batch join over
    materialized sides — the property that lets its state stay bounded
    on an unbounded stream."""
    from bq_nvd_spark.streaming.micro_batch import stream_events

    errors = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("e_ts"))
        & (F.col("c_ts") <= F.col("e_ts") + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    )
    # A streaming plan can't be optimized/executed without start();
    # the analyzed plan is the static signal: the inner join survives
    # analysis and BOTH sides kept their watermarks (what bounds the
    # symmetric-hash join's state at runtime).
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "Join Inner" in plan
    assert plan.count("EventTimeWatermark") == 2


def test_refined_ivf_broadcasts_every_index_structure(spark, sf_dir):
    """Neither the centroid array, the anchor arrays, nor the probe set
    may shuffle the corpus: every index-side join in the refined-IVF
    plan must be a broadcast, leaving the candidate join's exchange as
    the only corpus shuffle."""
    from bq_nvd_spark.plans.similarity_search import ivf_refined_topk

    df = ivf_refined_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_approx_aggregates_track_exact(spark, sf_dir):
    """The 100 TB fallbacks for exact-but-expensive aggregates: HLL
    approx_count_distinct and approx_percentile must land within their
    documented error bands on this data — the check that keeps the
    "use the approx form at scale" advice in the docstrings honest."""
    from bq_nvd_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select(
        F.countDistinct("o_custkey").alias("d"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50"),
    ).collect()[0]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("d"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
    ).collect()[0]
    assert abs(approx["d"] - exact["d"]) / exact["d"] < 0.05
    assert abs(approx["p50"] - exact["p50"]) / exact["p50"] < 0.01


def test_runtime_bloom_filter_prunes_application_side(spark, sf_dir):
    """Runtime row-level bloom filtering: a selective filter on the
    creation (dimension) side of a shuffle join injects a bloom-filter
    subquery that pre-filters the fact side BEFORE its shuffle — at
    100 TB this is the difference between shuffling every lineitem row
    and shuffling only rows whose key can possibly match. Thresholds
    are lowered to make the local fixture eligible; on a real cluster
    the defaults (10 MB creation / 10 GB application) gate it."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan  # built on the filtered dim side
        assert "might_contain" in plan  # applied to l_orderkey pre-shuffle
        # semantics unchanged by the injected filter
        for k, v in confs.items():
            spark.conf.unset(k) if prev[k] is None else spark.conf.set(k, prev[k])
        naive = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, naive.collect()))
    finally:
        for k, v in prev.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_salted_join_plan_spreads_hot_key(spark):
    """The salted-join rewrite's plan shape: the physical join keys are
    (key, _salt) — so a hot key spreads over n_salts reducers — and the
    dimension side carries the explode that replicates it once per
    salt. Pinned on the plan, not timing (scripts/skew_stress.py holds
    the measured salted-vs-unsalted numbers; SCALE.md quotes them)."""
    from bq_nvd_spark.operators.skew import salted_join

    fact = spark.range(1000).select(
        F.col("id").alias("event_id"), (F.col("id") % 3).alias("k")
    )
    dim = spark.range(3).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    out = salted_join(fact, dim, ["k"], id_col="event_id", n_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # join condition includes the salt on both sides
    assert "_salt" in plan
    joins = [ln for ln in plan.splitlines() if "Join" in ln and "_salt" in ln]
    assert joins, f"no join keyed on _salt in plan:\n{plan}"
    # the dimension replication is an explode/generate, not a crossJoin
    assert "Generate explode" in plan or "Explode" in plan
    # result parity with the naive join on this tiny fixture
    naive = sorted(map(tuple, fact.join(dim, "k").select("k", "w").collect()))
    salted = sorted(map(tuple, out.select("k", "w").collect()))
    assert naive == salted


def test_capped_pairs_window_and_collect_share_one_exchange(spark):
    """The capped-bucket sizing must ride the SAME shuffle as pair
    emission: one hashpartitioning exchange on (band, signature) feeds
    both the window count and the collect_list aggregation (whose
    partial/final halves carry no exchange between them), and the only
    other exchange is the final pair distinct. A second
    (band, signature) exchange would mean the census regressed to a
    separate pass over the signature relation."""
    import re

    from bq_nvd_spark.plans.llm import _capped_pairs

    bands = spark.createDataFrame(
        [(0, f"s{i // 5}", i) for i in range(100)],
        "band_idx int, band_sig string, doc_id long",
    )
    df = _capped_pairs(bands)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints the final AND the initial plan; count the final only.
    plan = plan.split("== Initial Plan ==")[0]
    band_exchanges = len(
        re.findall(r"Exchange hashpartitioning\(band_idx", plan)
    )
    pair_exchanges = len(re.findall(r"Exchange hashpartitioning\(doc_a", plan))
    assert band_exchanges == 1, plan[:2000]
    assert pair_exchanges == 1, plan[:2000]
    assert "Window" in plan and "collect_list" in plan


def test_capped_pairs_refines_oversized_buckets_with_star_fallback(spark):
    """Oversized MinHash buckets must be REFINED, not dropped (round 11):
    mass-duplicate docs — identical text, so identical band AND refine
    signatures — land in one oversized bucket whose refined sub-bucket
    is still past the cap, and the star fallback emits exactly m−1
    pairs anchored at the min doc_id. Without refine_docs the legacy
    drop-the-bucket behavior is preserved (the synthetic-band callers)."""
    from bq_nvd_spark.plans.llm import PAIR_BUCKET_CAP, _capped_pairs

    m = PAIR_BUCKET_CAP + 5
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(m)]
        + [(1000 + i, f"unrelated text number {i} " * 3) for i in range(3)],
        "doc_id long, text string",
    )
    import bq_nvd_spark.plans.llm as llm

    sigs = docs.select(
        "doc_id", llm.band_sigs_np("text").alias("sigs")
    ).select(
        "doc_id",
        F.posexplode("sigs").alias("band_idx", "band_sig"),
    )
    # drop mode: the 25-member bucket vanishes entirely — only the
    # small near-dup bucket of the three 1000-group docs may pair
    dropped = sorted(
        (r.doc_a, r.doc_b) for r in _capped_pairs(sigs).collect()
    )
    assert all(a >= 1000 for a, _ in dropped), dropped
    # refine mode: identical texts share refine sigs → sub-bucket still
    # oversized → star on the min id, deduped across bands; the small
    # bucket's pairs are unchanged
    refined = sorted(
        (r.doc_a, r.doc_b) for r in _capped_pairs(sigs, docs).collect()
    )
    assert refined == [(0, i) for i in range(1, m)] + dropped, refined
