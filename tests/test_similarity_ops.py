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
