"""Behavioral invariants for the round-5 operators.

Oracle parity already pins exact Spark-vs-DuckDB equality; these tests
pin the SEMANTIC claims the docstrings make — survivorship rules,
per-stratum counts, verifier symmetry against a Python reference —
which a hash match alone would not localize if broken.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.plans.llm import (
    EDIT_MAX,
    EDIT_PREFIX,
    dedup_clusters,
    dedup_survivors,
    edit_distance_verified_pairs,
    tfidf_top_terms,
)
from bq_nvd_spark.plans.sampling import (
    STRATUM_K,
    stratified_sample_per_lang,
)
from bq_nvd_spark.plans.similarity_search import label_centroids
from bq_nvd_spark.sources.tables import load_table


def test_stratified_sample_exact_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = stratified_sample_per_lang(spark, sf_dir).collect()
    per_lang: dict[str, int] = {}
    for r in got:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    assert set(per_lang) == set(sizes)
    for lang, n in per_lang.items():
        assert n == min(STRATUM_K, sizes[lang]), lang
    # id-stable: a rerun draws the identical rows
    again = {(r["doc_id"], r["lang"]) for r in stratified_sample_per_lang(spark, sf_dir).collect()}
    assert {(r["doc_id"], r["lang"]) for r in got} == again


def test_dedup_survivorship_partition(spark, sf_dir):
    """survivors ∪ dropped == corpus, disjoint; each cluster keeps
    exactly its minimum id (the stated survivorship rule)."""
    all_ids = {
        r["doc_id"] for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    clusters = dedup_clusters(spark, sf_dir).collect()
    survivors = {r["doc_id"] for r in dedup_survivors(spark, sf_dir).collect()}
    dropped = {r["doc_id"] for r in clusters if r["doc_id"] != r["cluster_id"]}
    assert survivors | dropped == all_ids
    assert not (survivors & dropped)
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for rep, members in by_cluster.items():
        assert rep == min(members)
        assert rep in survivors
        for m in members:
            assert (m in survivors) == (m == rep)


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_match_python_reference(spark, sf_dir):
    pairs = edit_distance_verified_pairs(spark, sf_dir).collect()
    assert pairs, "verifier returned no pairs at test SF"
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert r["edit_dist"] <= EDIT_MAX
        ref = _py_levenshtein(
            texts[r["doc_a"]][:EDIT_PREFIX], texts[r["doc_b"]][:EDIT_PREFIX]
        )
        assert r["edit_dist"] == ref, (r["doc_a"], r["doc_b"])


def test_tfidf_topk_shape_and_scores(spark, sf_dir):
    rows = tfidf_top_terms(spark, sf_dir).collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        assert r["tfidf"] > 0
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(per_doc) == n_docs
    assert all(n <= 3 for n in per_doc.values())


def test_label_centroids_counts_and_bounds(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    true_counts = {
        r["label"]: r["n"]
        for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = label_centroids(spark, sf_dir).collect()
    assert len(rows) == len(true_counts) * 64
    bounds = {
        r["label"]: (r["lo"], r["hi"])
        for r in emb.select(
            "label",
            F.array_min(F.transform("embedding", lambda x: x.cast("double"))).alias("m1"),
            F.array_max(F.transform("embedding", lambda x: x.cast("double"))).alias("m2"),
        )
        .groupBy("label")
        .agg(F.min("m1").alias("lo"), F.max("m2").alias("hi"))
        .collect()
    }
    for r in rows:
        assert r["n_vecs"] == true_counts[r["label"]]
        lo, hi = bounds[r["label"]]
        assert lo - 1e-6 <= r["centroid_r"] <= hi + 1e-6


def test_weighted_sample_favors_heavy_docs_and_avoids_global_sort(spark, sf_dir):
    """Efraimidis-Spirakis keys must (a) bias selection toward high-weight
    (long) documents, (b) be id-stable across runs, and (c) compile the
    global top-K to TakeOrderedAndProject (per-partition heaps), never a
    full corpus sort."""
    from bq_nvd_spark.plans.sampling import WEIGHTED_K, weighted_sample_docs

    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    df = weighted_sample_docs(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == WEIGHTED_K
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean  # weight = n_chars must show up in the draw
    # deterministic: a second run selects the identical ids
    again = {r["doc_id"] for r in weighted_sample_docs(spark, sf_dir).collect()}
    assert again == {r["doc_id"] for r in rows}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_moment_stats_agree_with_builtin_corr(spark, sf_dir):
    """The integer-moment correlation must agree with Spark's float
    corr() aggregate to float precision — same statistic, different
    (order-proof) accumulation."""
    from bq_nvd_spark.plans.events import moment_stats_by_type

    got = {r["event_type"]: r for r in moment_stats_by_type(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    ref = {
        r["event_type"]: r["c"]
        for r in ev.groupBy("event_type").agg(F.corr("k", "cents").alias("c")).collect()
    }
    assert set(got) == set(ref) and got
    for etype, row in got.items():
        assert abs(row["corr_r"] - ref[etype]) < 1e-5


def test_bpe_training_invariants(spark, sf_dir):
    """Round 0 must adopt exactly the census's top pair; adoption
    frequency is non-increasing across rounds (a new merge's pairs can
    never outnumber the merge that created them); merged tokens carry
    the '~' marker into later rounds' candidate space."""
    from bq_nvd_spark.plans.llm import BPE_ROUNDS, bpe_merge_census, bpe_train_merges

    rows = {r["merge_round"]: r for r in bpe_train_merges(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(BPE_ROUNDS))
    census_top = bpe_merge_census(spark, sf_dir).first()
    assert rows[0]["pair"] == census_top["pair"]
    assert rows[0]["n"] == census_top["n"]
    ns = [rows[r]["n"] for r in range(BPE_ROUNDS)]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_bm25_semantics_on_controlled_fixture(spark, tmp_path):
    """BM25 invariants on a corpus built to separate them: length
    normalization (same tf, longer doc scores LOWER), tf monotonicity
    (same length, higher tf scores HIGHER), non-matching docs absent,
    and n_terms_matched counts distinct matched query terms."""
    from bq_nvd_spark.plans.llm import BM25_TOPK, bm25_topk_docs

    filler = "x"
    rows = [
        (1, " ".join(["hash", "join"] + [filler] * 8)),  # 2 terms, dl=10
        (2, " ".join(["hash"] * 3 + [filler] * 7)),  # tf=3, dl=10
        (3, " ".join(["hash"] + [filler] * 99)),  # tf=1, dl=100
        (4, " ".join(["hash"] + [filler] * 9)),  # tf=1, dl=10
        (5, " ".join([filler] * 10)),  # no query terms
    ]
    sf = str(tmp_path / "bm25_fixture")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in bm25_topk_docs(spark, sf).collect()}
    assert len(got) <= BM25_TOPK
    assert 5 not in got  # no query term -> never retrieved
    # length normalization: identical tf, 10x the length, lower score
    assert got[4]["bm25_micro"] > got[3]["bm25_micro"]
    # tf monotonicity at equal length (saturating but increasing)
    assert got[2]["bm25_micro"] > got[4]["bm25_micro"]
    assert got[1]["n_terms_matched"] == 2
    assert all(
        got[d]["n_terms_matched"] == 1 for d in (2, 3, 4)
    )


def test_dsir_resample_enriches_target_domain(spark, tmp_path):
    """DSIR's whole point, tested where the signal is unambiguous: a
    constructed corpus of EQUAL-LENGTH docs (so the extensive-in-length
    weight cannot confound selection) in two domains with disjoint-ish
    token distributions. Held target-domain docs must score higher
    per-feature log-weights, and the Gumbel-top-K resample must be
    overwhelmingly target-domain. (The driver-fixture langs share one
    31-token vocabulary with ~0.003 nat/token divergence — real signal
    lives only in a constructed corpus; the registered queries on the
    driver tables are exactness-gated by their hash oracles.)"""
    import random

    from bq_nvd_spark.plans.sampling import (
        DSIR_K,
        dsir_importance_weights,
        dsir_resample_topk,
    )

    rng = random.Random(7)
    vocab_a = [f"alpha{i}" for i in range(12)]
    vocab_b = [f"beta{i}" for i in range(12)]
    shared = [f"common{i}" for i in range(6)]
    rows = []
    for did in range(400):
        target = did % 2 == 0
        main = vocab_a if target else vocab_b
        toks = [
            rng.choice(main) if rng.random() < 0.8 else rng.choice(shared)
            for _ in range(40)
        ]
        text = " ".join(toks)
        rows.append(
            (did, text, "en" if target else "xx", "src0", len(text))
        )
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    pool = dsir_importance_weights(spark, str(tmp_path)).collect()
    langs = {r["lang"] for r in pool}
    assert langs == {"en", "xx"}  # both domains present in the held split
    tgt = [r["logw_micro"] for r in pool if r["lang"] == "en"]
    rest = [r["logw_micro"] for r in pool if r["lang"] == "xx"]
    # complete separation: every target doc outweighs every off-target doc
    assert min(tgt) > max(rest)

    sample = dsir_resample_topk(spark, str(tmp_path)).collect()
    assert len(sample) == DSIR_K < len(pool)
    samp_frac = sum(1 for r in sample if r["lang"] == "en") / len(sample)
    pool_frac = len(tgt) / len(pool)
    assert pool_frac < 0.65  # the pool itself is mixed
    assert samp_frac >= 0.9  # the resample is overwhelmingly target


def test_dsir_determinism_and_selection_shape(spark, sf_dir):
    """On the driver fixture: the resample is id-stable across runs
    and the top-K compiles to TakeOrderedAndProject (per-partition
    heaps), never a global sort of the pool."""
    from bq_nvd_spark.plans.sampling import DSIR_K, dsir_resample_topk

    df = dsir_resample_topk(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == DSIR_K
    again = {r["doc_id"] for r in dsir_resample_topk(spark, sf_dir).collect()}
    assert again == {r["doc_id"] for r in rows}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_temperature_quotas_flatten_the_mixture(spark, tmp_path):
    """alpha=1/2 temperature sampling must shrink the head source's
    share and grow the tail source's share relative to raw proportions,
    never exceed any source's inventory, and bind capacity on the
    scarcest source under its flattened share. Skewed synthetic corpus
    with known closed-form expectations."""
    from bq_nvd_spark.plans import QUERIES

    sizes = {"big": 400, "mid": 100, "tiny": 25}
    rows, did = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((did, f"text {did}", "en", src, 7))
            did += 1
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["source"]: r.asDict()
        for r in QUERIES["temperature_mixture_quotas"](
            spark, str(tmp_path)
        ).collect()
    }
    # sqrt weights: 20e6 / 10e6 / 5e6; sum_w = 35e6.
    assert got["big"]["w_micro"] == 20_000_000
    assert got["mid"]["w_micro"] == 10_000_000
    assert got["tiny"]["w_micro"] == 5_000_000
    # capacity = min(n_s*sum_w // w_s) = min(700, 350, 175) = 175
    # (tiny binds); quotas = floor(w_s*175/35e6) = 100 / 50 / 25.
    assert {s: got[s]["quota"] for s in sizes} == {
        "big": 100, "mid": 50, "tiny": 25,
    }
    total_n, total_q = sum(sizes.values()), 175
    for s, n in sizes.items():
        assert got[s]["quota"] <= n
    # flattening: head share falls (400/525 -> 100/175), tail share
    # rises (25/525 -> 25/175)
    assert got["big"]["quota"] / total_q < sizes["big"] / total_n
    assert got["tiny"]["quota"] / total_q > sizes["tiny"] / total_n


def test_tokenizer_fertility_conservation_laws(spark, sf_dir):
    # Two exact conservation laws pin the census to the raw corpus:
    # (1) content characters are INVARIANT under merging — per-lang
    # n_chars must equal the original corpus' content chars; (2) each
    # applied merge replaces one space with one '~', so original token
    # count = encoded n_tokens + total applied merges, and the merged-
    # token count never exceeds either side.
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.sources.tables import load_table

    census = {
        r["lang"]: r.asDict()
        for r in QUERIES["tokenizer_fertility_census"](
            spark, sf_dir
        ).collect()
    }
    toks = F.split("text", " ")
    base = {
        r["lang"]: r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            (F.length("text") - (F.size(toks) - 1)).alias("chars"),
            F.size(toks).alias("ntoks"),
        )
        .groupBy("lang")
        .agg(
            F.sum("chars").alias("chars"),
            F.sum("ntoks").alias("ntoks"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .collect()
    }
    assert set(census) == set(base)
    for lang, c in census.items():
        b = base[lang]
        assert c["n_chars"] == b["chars"], lang  # law (1)
        assert c["n_docs"] == b["n_docs"], lang
        applied = b["ntoks"] - c["n_tokens"]
        assert applied >= 0, lang  # merging never adds tokens
        # law (2): >=1 merge per merged token, so the merged-token
        # count is bounded by the applied-merge count
        assert 0 <= c["n_merged_tokens"] <= applied, lang
    # fixture non-degeneracy: the learned merges actually fired
    assert sum(c["n_merged_tokens"] for c in census.values()) > 0
