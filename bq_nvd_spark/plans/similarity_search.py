"""E3 queries: LSH-bucketed approximate nearest neighbor (scale path).

The exactness baseline is ``plans/llm.py::cosine_topk`` (brute force,
O(N·Q)); here the same query/candidate split runs through the sign-LSH
bucket join from ``operators/similarity.py``. The result is the exact
cosine top-k *restricted to bucket-sharing candidates* — deterministic
in both engines because the hyperplanes are fixed literals and every
float reduction is a sequential fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.operators.similarity import (
    band_buckets_np,
    duck_band_buckets,
    duck_fold_dot,
    fold_dot,
)
from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table

TOP_K = 10
_QUERY_MAX_ID = 5  # vec_id < 5 are the query set, the rest the corpus


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sig AS MATERIALIZED (
      SELECT vec_id, v,
             SQRT({duck_fold_dot('v', 'v')}) AS nrm,
             {duck_band_buckets('v')}        AS bands
      FROM e
    ),
    buckets AS (
      SELECT vec_id, v, nrm, b.band_idx, bands[b.band_idx + 1] AS bucket
      FROM sig, (SELECT UNNEST(range(0, 4)) AS band_idx) b
    ),
    q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, band_idx, bucket
          FROM buckets WHERE vec_id < {_QUERY_MAX_ID}),
    c AS (SELECT vec_id, v AS cv, nrm AS cn, band_idx, bucket
          FROM buckets WHERE vec_id >= {_QUERY_MAX_ID}),
    cand AS (
      SELECT DISTINCT q.q_id, q.qv, q.qn, c.vec_id, c.cv, c.cn
      FROM q JOIN c ON q.band_idx = c.band_idx AND q.bucket = c.bucket
    ),
    scored AS (
      SELECT q_id, vec_id,
             FLOOR({duck_fold_dot('qv', 'cv')} / (qn * cn) * 10000 + 0.5)
               / 10000 AS sim
      FROM cand
    )
    SELECT q_id, vec_id, sim
    FROM (
      SELECT q_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY sim DESC, vec_id) AS rn
      FROM scored
    )
    WHERE rn <= {TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k: signatures are a per-row projection, candidate
    generation is an equi-join on (band, bucket) — never a corpus cross
    join — and only bucket-sharing pairs pay the exact cosine."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # Signatures via the Arrow/numpy twin of band_buckets: one matmul per
    # batch instead of ~4k interpreted HOF lambda evaluations per row
    # (HOFs never codegen; see operators/similarity.py::band_buckets_np).
    sig = emb.select(
        "vec_id",
        "v",
        F.sqrt(fold_dot("v", "v")).alias("nrm"),
        band_buckets_np("v").alias("bands"),
    )
    buckets = sig.select(
        "vec_id", "v", "nrm", F.posexplode("bands").alias("band_idx", "bucket")
    )
    q = buckets.filter(F.col("vec_id") < _QUERY_MAX_ID).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "band_idx",
        "bucket",
    )
    c = buckets.filter(F.col("vec_id") >= _QUERY_MAX_ID).select(
        "vec_id",
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        "band_idx",
        "bucket",
    )
    # Score straight off the broadcast join, THEN distinct: the score is
    # deterministic per (q, c) pair, so band-duplicate matches collapse in
    # a distinct over three scalar columns — no 64-double vector payload
    # ever enters a shuffle.
    scored = (
        c.join(F.broadcast(q), ["band_idx", "bucket"])
        .select(
            "q_id",
            "vec_id",
            (
                F.floor(
                    fold_dot("qv", "cv") / (F.col("qn") * F.col("cn")) * 10000
                    + 0.5
                )
                / 10000
            ).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.select("q_id", "vec_id", "sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


SIMILAR_COS = 0.40


@query(
    "embedding_similar_pairs",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sig AS MATERIALIZED (
      SELECT vec_id, v,
             SQRT({duck_fold_dot('v', 'v')}) AS nrm,
             {duck_band_buckets('v')}        AS bands
      FROM e
    ),
    buckets AS (
      SELECT vec_id, v, nrm, b.band_idx, bands[b.band_idx + 1] AS bucket
      FROM sig, (SELECT UNNEST(range(0, 4)) AS band_idx) b
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             FLOOR({duck_fold_dot('a.v', 'b.v')} / (a.nrm * b.nrm) * 10000 + 0.5)
               / 10000 AS sim
      FROM buckets a JOIN buckets b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, sim FROM pairs WHERE sim >= {SIMILAR_COS}
    """,
)
def embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: embedding-cosine near-dup pairs — the vector-space twin of
    MinHash near-dedup. Candidates are corpus self-pairs sharing any LSH
    band bucket (equi-join on (band, bucket), id_a < id_b halves the
    pair space); only candidates pay the exact fold-ordered cosine, and
    pairs at or above the threshold survive. The threshold is the only
    dedup parameter: this corpus contains no true near-duplicates (max
    pairwise cosine ~0.51), so the registered query runs the identical
    plan at 0.40 to keep the correctness signal non-vacuous.

    At 100 TB the bucket join is the whole story: the corpus never
    cross-joins itself, shuffle keys are hash-uniform, and the cosine
    threshold prunes before anything aggregates. Near-identical vectors
    agree on all bands, so recall at 0.99 cosine is near-exact.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    sig = emb.select(
        "vec_id",
        "v",
        F.sqrt(fold_dot("v", "v")).alias("nrm"),
        band_buckets_np("v").alias("bands"),
    )
    buckets = sig.select(
        "vec_id", "v", "nrm", F.posexplode("bands").alias("band_idx", "bucket")
    )
    left = buckets.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        "band_idx",
        "bucket",
    )
    right = buckets.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        "band_idx",
        "bucket",
    )
    pairs = (
        left.join(right, ["band_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.floor(
                    fold_dot("va", "vb") / (F.col("na") * F.col("nb")) * 10000
                    + 0.5
                )
                / 10000
            ).alias("sim"),
        )
        .distinct()
    )
    return pairs.filter(F.col("sim") >= SIMILAR_COS)
