"""Invariants for the round-7 additions (oracle hash-parity is the
driver's job; these pin the algebraic properties a hash can't name).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kmeans_clusters_partition_the_corpus(spark, sf_dir):
    """Every vector lands in exactly one cluster: cluster sizes sum to
    the corpus size, cluster ids come from the seed range, and each
    (cl, pos) centroid coordinate appears exactly once."""
    from bq_nvd_spark.plans.clustering import (
        K_CLUSTERS,
        kmeans_lloyd_clusters,
    )
    from bq_nvd_spark.sources.tables import load_table

    out = kmeans_lloyd_clusters(spark, sf_dir)
    rows = out.collect()
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    sizes = {}
    for r in rows:
        sizes[r["cl"]] = r["n_vecs"]
        assert 0 <= r["cl"] < K_CLUSTERS
    assert sum(sizes.values()) == n_corpus
    # one row per (cl, pos)
    assert len(rows) == len({(r["cl"], r["pos"]) for r in rows})
    # 64 coordinates per surviving cluster
    per_cl = {}
    for r in rows:
        per_cl[r["cl"]] = per_cl.get(r["cl"], 0) + 1
    assert all(v == 64 for v in per_cl.values())


def test_kmeans_update_tightens_or_holds_inertia(spark, sf_dir):
    """Lloyd's invariant: re-assigning against the UPDATED centroids
    never increases total within-cluster squared distance (the reason
    the iteration converges). Checked in the same exact integer micro
    space the query computes in."""
    from pyspark.sql.window import Window

    from bq_nvd_spark.plans.clustering import K_CLUSTERS, _MICRO
    from bq_nvd_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * _MICRO + 0.5).cast("long"),
            )
        ).alias("pos", "q"),
    ).localCheckpoint()

    def assign(cents):
        diff = F.col("q") - F.col("c")
        d = (
            m.join(F.broadcast(cents), "pos")
            .groupBy("vec_id", "cl")
            .agg(F.sum(diff * diff).alias("d2"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cl"))
        return (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cl", "d2")
        )

    def update(assigned):
        return (
            m.join(assigned.select("vec_id", "cl"), "vec_id")
            .groupBy("cl", "pos")
            .agg(
                F.floor(F.sum("q").cast("double") / F.count(F.lit(1)) + 0.5)
                .cast("long")
                .alias("c")
            )
        )

    c0 = m.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cl"), "pos", F.col("q").alias("c")
    )
    a1 = assign(c0).localCheckpoint()
    inertia1 = a1.agg(F.sum("d2")).collect()[0][0]
    a2 = assign(update(a1))
    inertia2 = a2.agg(F.sum("d2")).collect()[0][0]
    # Exact Lloyd's never increases inertia; rounding the mean to micro
    # ints adds at most n_members*||c̃-c*||² per cluster (bias-variance
    # identity), i.e. ≤ 64 dims × (0.5 micro)² = 16 micro² per vector.
    # 64n is a safe integer ceiling for that slack.
    n = emb.count()
    assert inertia2 <= inertia1 + 64 * n


def test_chunking_covers_every_token_exactly_by_stride(spark, sf_dir):
    """Chunk arithmetic: per doc, chunk count is ceil(L / stride),
    chunk 0 starts at the first token, the last chunk ends at the last
    token, and every chunk holds between 1 and CHUNK_TOKENS tokens."""
    from bq_nvd_spark.plans.curation import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        chunk_documents_sliding,
    )
    from bq_nvd_spark.sources.tables import load_table

    out = chunk_documents_sliding(spark, sf_dir)
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.min("n_tokens").alias("min_n"),
            F.max("n_tokens").alias("max_n"),
        )
        .collect()
    )
    lens = {
        r["doc_id"]: r["L"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("L"))
        .collect()
    }
    for r in per_doc:
        L = lens[r["doc_id"]]
        expect_chunks = -(-L // CHUNK_STRIDE)  # ceil
        assert r["n_chunks"] == expect_chunks
        assert r["max_idx"] == expect_chunks - 1
        assert 1 <= r["min_n"] and r["max_n"] <= CHUNK_TOKENS


def test_bpe_encode_census_consistent_with_training_rewrite(spark, sf_dir):
    """The encode census must reflect every adopted merge: each learned
    merge token (a~b) appears in the encoded vocabulary with a count
    no larger than the pair frequency at adoption time (later merges
    can only consume occurrences, never create them)."""
    from bq_nvd_spark.plans.llm import bpe_encode_top_tokens, bpe_train_merges

    merges = {
        r["pair"]: (r["merge_round"], r["n"])
        for r in bpe_train_merges(spark, sf_dir).collect()
    }
    encoded = {
        r["tok"]: r["n"] for r in bpe_encode_top_tokens(spark, sf_dir).collect()
    }
    for pair, (_, n_at_adoption) in merges.items():
        tok = pair.replace(" ", "~")
        if tok in encoded:
            assert encoded[tok] <= n_at_adoption


def test_textrank_scores_bounded_and_nodes_are_cooccurring_tokens(spark, sf_dir):
    """Damped-PageRank invariants: every score is at least the (1-d)
    floor of 150 000 micro, the ranking is (pr desc, tok) with no
    duplicates, and every ranked token participates in at least one
    adjacent-pair co-occurrence with a DIFFERENT token (the node-set
    definition)."""
    from bq_nvd_spark.plans.llm import TEXTRANK_TOP, textrank_keywords
    from bq_nvd_spark.sources.tables import load_table

    rows = textrank_keywords(spark, sf_dir).collect()
    assert 0 < len(rows) <= TEXTRANK_TOP
    assert all(r["pr"] >= 150_000 for r in rows)
    # descending, ties broken by token
    key = [(-r["pr"], r["tok"]) for r in rows]
    assert key == sorted(key)

    docs = load_table(spark, sf_dir, "documents")
    toks_rows = docs.select(F.split("text", " ").alias("toks")).collect()
    cooccur = set()
    for r in toks_rows:
        t = r["toks"]
        for a, b in zip(t, t[1:]):
            if a != b:
                cooccur.add(a)
                cooccur.add(b)
    assert all(r["tok"] in cooccur for r in rows)


def test_gap_fill_and_rfm_and_pmi_on_fixture(spark, sf_dir):
    """Fixture-level invariants for the round-7 warehouse queries:
    gap-fill emits a dense day×type grid with zero-filled gap days and
    a carry that never regresses to NULL after first activity; RFM
    covers every customer exactly once with quartiles in 1..4; PMI
    rows all meet the min-count gate and rank deterministically."""
    from bq_nvd_spark.plans.events import gap_fill_daily_counts
    from bq_nvd_spark.plans.llm import PMI_MIN_COUNT, collocation_pmi_top
    from bq_nvd_spark.plans.relational import customer_rfm_segments
    from bq_nvd_spark.sources.tables import load_table

    gf = gap_fill_daily_counts(spark, sf_dir).collect()
    by_type = {}
    for r in gf:
        by_type.setdefault(r["event_type"], []).append(r)
    days_per_type = {t: len(rs) for t, rs in by_type.items()}
    # dense grid: every type spans the same calendar
    assert len(set(days_per_type.values())) == 1
    for rs in by_type.values():
        rs.sort(key=lambda r: r["day"])
        seen_value = False
        for r in rs:
            assert r["n_events"] >= 0
            if r["cents_carried"] is not None:
                seen_value = True
            if seen_value:
                assert r["cents_carried"] is not None  # carry never drops

    rfm = customer_rfm_segments(spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert len(rfm) == n_cust
    for r in rfm:
        assert 1 <= r["r"] <= 4 and 1 <= r["f"] <= 4 and 1 <= r["mo"] <= 4
        assert r["segment"] == r["r"] * 100 + r["f"] * 10 + r["mo"]

    pmi = collocation_pmi_top(spark, sf_dir).collect()
    assert all(r["n_ab"] >= PMI_MIN_COUNT for r in pmi)
    key = [(-r["pmi_ratio"], r["a"], r["b"]) for r in pmi]
    assert key == sorted(key)


def test_lower_median_even_count_and_mad_edge(spark):
    """value_mad_outliers' lower-median on synthetic data: an even-count
    partition must select the LOWER middle element (not interpolate),
    an all-equal partition yields MAD 0 with 0 outliers, and a single
    far value beyond 3 MADs is counted."""
    import pandas as pd

    from bq_nvd_spark.plans.events import value_mad_outliers

    # even: values 1,2,3,4 -> lower median 2; deviations 1,0,1,2 ->
    # sorted 0,1,1,2 -> lower median (mad) 1; outliers: |v-2|>3 -> none
    # flat: all 5.00 -> med 5.00, mad 0; outlier rule d>0 -> the 9.00 row
    rows = []
    eid = 0
    for v in (1, 2, 3, 4):
        rows.append(("even", eid, float(v))); eid += 1
    for v in (5, 5, 5, 9):
        rows.append(("flat", eid, float(v))); eid += 1
    pdf = pd.DataFrame(rows, columns=["event_type", "event_id", "value"])
    # load_table's events repair expects a ts column; value is what the
    # query reads.
    pdf["ts"] = pd.Timestamp("2026-01-01").as_unit("us")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(f"{d}/events.parquet")
        # value_mad_outliers only reads events; other tables untouched
        out = {
            r["event_type"]: r
            for r in value_mad_outliers(spark, d).collect()
        }
    assert out["even"]["med_cents"] == 200
    assert out["even"]["mad_cents"] == 100
    assert out["even"]["n_outliers"] == 0
    assert out["flat"]["med_cents"] == 500
    assert out["flat"]["mad_cents"] == 0
    assert out["flat"]["n_outliers"] == 1  # 9.00 sits 400 > 3*0 cents away
