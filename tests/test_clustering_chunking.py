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
