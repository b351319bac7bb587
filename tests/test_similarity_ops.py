"""The two band-bucket formulations must agree bit-for-bit.

``band_buckets`` (higher-order functions, fold-ordered — mirrored by the
DuckDB oracle) is the semantic definition; ``band_buckets_np`` (Arrow +
numpy matmul) is the production fast path. They can only disagree if
some |vector·plane| sits within float-reorder error of zero; this test
pins exact equality on the test corpus, which also certifies the margin
assumption the fast path documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.operators.similarity import band_buckets, band_buckets_np
from bq_nvd_spark.sources.tables import load_table


def test_band_bucket_formulations_agree(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    both = emb.select(
        "vec_id",
        band_buckets("v").alias("hof"),
        band_buckets_np("v").alias("np"),
    )
    diff = both.filter(F.col("hof") != F.col("np")).count()
    assert diff == 0
    assert both.count() > 0


def test_minhash_band_formulations_agree(spark, sf_dir):
    """band_sigs_np (hashlib over Arrow) must equal band_sigs_hof (the
    HOF definition the oracle mirrors) string-for-string."""
    from bq_nvd_spark.plans.llm import band_sigs_hof, band_sigs_np

    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        "doc_id",
        band_sigs_hof("text").alias("hof"),
        band_sigs_np("text").alias("np"),
    )
    assert both.filter(F.col("hof") != F.col("np")).count() == 0
    assert both.count() > 0


def test_fold_dot_formulations_agree(spark, sf_dir):
    """fold_dot_np (Arrow cumsum) must equal fold_dot (sequential HOF
    left-fold, the oracle's definition) BIT-for-bit — not approximately:
    cumsum accumulates in the identical IEEE-754 order, so every
    intermediate rounding matches. Cross pairs exercise unequal inputs."""
    from bq_nvd_spark.operators.similarity import fold_dot, fold_dot_np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    self_pairs = emb.select(
        "vec_id",
        fold_dot("v", "v").alias("hof"),
        fold_dot_np("v", "v").alias("np"),
    )
    assert self_pairs.filter(F.col("hof") != F.col("np")).count() == 0
    assert self_pairs.count() > 0

    a = emb.filter(F.col("vec_id") < 5).select(
        F.lit(1).alias("k"), F.col("v").alias("va")
    )
    b = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 25)).select(
        F.lit(1).alias("k"), F.col("v").alias("vb")
    )
    cross = a.join(b, "k").select(
        fold_dot("va", "vb").alias("hof"),
        fold_dot_np("va", "vb").alias("np"),
    )
    assert cross.filter(F.col("hof") != F.col("np")).count() == 0
    assert cross.count() == 100


def test_shingle_hash_kernel_matches_hof_counts(spark, sf_dir):
    """The Arrow shingle-hash kernel must produce the same DISTINCT
    bigram count per document as the HOF formulation it replaced (the
    hashes themselves are internal — only set cardinalities and
    intersections reach the output)."""
    from bq_nvd_spark.plans.llm import _shingle_hashes_np

    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 2
    )
    toks = F.split("text", " ")
    hof_shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )
    both = docs.select(
        "doc_id",
        F.size(hof_shingles).alias("n_hof"),
        F.size(_shingle_hashes_np("text")).alias("n_np"),
    )
    assert both.filter(F.col("n_hof") != F.col("n_np")).count() == 0
    assert both.count() > 0


def test_simhash_formulations_agree(spark, sf_dir):
    """_simhash_np (hashlib+numpy over Arrow) must equal simhash_hof
    (the per-row HOF definition the oracle mirrors) bit-for-bit."""
    from bq_nvd_spark.plans.llm import _simhash_np, simhash_hof

    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        "doc_id",
        simhash_hof().alias("hof"),
        _simhash_np("text").alias("np"),
    )
    assert both.filter(F.col("hof") != F.col("np")).count() == 0
    assert both.count() > 0


def test_pq_adc_recall_bound_holds_with_margin(spark, sf_dir):
    """The PQ pipeline's recall_ok must be TRUE for every query (that is
    what the driver hash asserts), and the subspace-dot kernel must agree
    with a per-row Python fold — the batch-independence claim."""
    import numpy as np

    from bq_nvd_spark.operators.similarity import PQ_M, subspace_dots_np
    from bq_nvd_spark.plans.pq import pq_adc_recall_topk

    out = pq_adc_recall_topk(spark, sf_dir)
    rows = out.collect()
    assert rows and all(r["recall_ok"] for r in rows)

    emb = load_table(spark, sf_dir, "embeddings").limit(20).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    got = emb.select("vec_id", "v", subspace_dots_np("v", "v").alias("d")).collect()
    sub = 64 // PQ_M
    for r in got:
        v = np.asarray(r["v"])
        for m in range(PQ_M):
            ref = 0.0
            for x in v[m * sub : (m + 1) * sub]:
                ref += x * x  # sequential fold, same order as the kernel
            assert r["d"][m] == ref
