"""Iterative clustering over the embedding corpus — Lloyd's k-means.

The LLM-pipeline mandate's semantic-grouping primitive (corpus
topic/domain bucketing, dedup-cluster seeding, mixture balancing):
label_centroids (similarity_search.py) is the SUPERVISED prototype
builder; this is the unsupervised twin — k-means with deterministic
seeding, run for a fixed number of Lloyd iterations.

Exactness across engines: float element-wise means and distances are
summation-order-sensitive, so every coordinate is quantized ONCE to
integer MICRO-units (|component| ≤ ~2, so 64-dim squared distances
stay ≤ ~1e15 ≪ 2^63 — exact BIGINT math), assignments argmin over
exact integer distances (ties broken on the lower cluster id), and
each centroid update re-rounds to micro ints via the suite's standard
FLOOR(x + 0.5)-on-double form (the sum being exact-integer makes the
divide the only float op). Both engines therefore walk IDENTICAL
iterates — the oracle is an exact hash gate, not an approximation.

Scale shape (100 TB): the flattened (vec_id, pos, q) relation is the
only big thing; per iteration it takes ONE broadcast join against the
k×64-row centroid relation, one (vec_id, cl) hash agg with map-side
partial sums, one row_number window PARTITIONED by vec_id (never
global), and one (cl, pos) hash agg for the update. Work is O(N·dim·k)
per iteration with no quadratic term and no driver-side data;
iterations are a fixed driver loop like connected components
(operators/graph.py) and BPE training (llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bq_nvd_spark.operators.checkpoint import stage_checkpoint
from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table

K_CLUSTERS = 4
LLOYD_ITERS = 2
_DIM = 64
_MICRO = 1_000_000


def _duck_assign(mrel: str, crel: str, arel: str) -> str:
    """One Lloyd assignment in DuckDB: exact integer squared distances,
    argmin per vector with ties to the lower cluster id."""
    return f"""
    d{arel} AS (
      SELECT {mrel}.vec_id, {crel}.cl,
             SUM(({mrel}.q - {crel}.c) * ({mrel}.q - {crel}.c)) AS d2
      FROM {mrel} JOIN {crel} USING (pos)
      GROUP BY {mrel}.vec_id, {crel}.cl
    ),
    {arel} AS (
      SELECT vec_id, cl FROM (
        SELECT vec_id, cl,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
        FROM d{arel}
      ) WHERE rn = 1
    )"""


def _duck_update(arel: str, crel: str) -> str:
    return f"""
    {crel} AS (
      SELECT {arel}.cl, m.pos,
             CAST(FLOOR(CAST(SUM(m.q) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
               AS c
      FROM m JOIN {arel} USING (vec_id)
      GROUP BY {arel}.cl, m.pos
    )"""


_KMEANS_ORACLE = (
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    m AS MATERIALIZED (
      SELECT vec_id, i - 1 AS pos,
             CAST(FLOOR(v[i] * {_MICRO} + 0.5) AS BIGINT) AS q
      FROM e, UNNEST(range(1, {_DIM + 1})) t(i)
    ),
    c0 AS (SELECT vec_id AS cl, pos, q AS c FROM m WHERE vec_id < {K_CLUSTERS}),"""
    + _duck_assign("m", "c0", "a1")
    + ","
    + _duck_update("a1", "c1")
    + ","
    + _duck_assign("m", "c1", "a2")
    + ","
    + _duck_update("a2", "c2")
    + """,
    sz AS (SELECT cl, COUNT(*) AS n_vecs FROM a2 GROUP BY cl)
    SELECT c2.cl, c2.pos, sz.n_vecs, c2.c AS centroid_micro
    FROM c2 JOIN sz USING (cl)
    """
)


@query("kmeans_lloyd_clusters", oracle=_KMEANS_ORACLE)
def kmeans_lloyd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means over the embedding corpus: k=4 seeded from the first k
    vec_ids, LLOYD_ITERS assign→update rounds, emitting the final
    centroids (micro-int coordinates) and cluster sizes.

    An empty cluster simply drops out of the update (standard Lloyd's);
    both engines drop it identically, so the gate stays exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Quantize once; the flat (vec_id, pos, q) relation feeds every
    # iteration, so materialize it (multi-consumer subplan — same
    # rationale as the IVF corpus relations).
    m = stage_checkpoint(
        emb.select(
            "vec_id",
            F.posexplode(
                F.transform(
                    "embedding",
                    lambda x: F.floor(x.cast("double") * _MICRO + 0.5).cast(
                        "long"
                    ),
                )
            ).alias("pos", "q"),
        )
    )
    cents = m.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cl"), "pos", F.col("q").alias("c")
    )
    assign = None
    for _ in range(LLOYD_ITERS):
        diff = F.col("q") - F.col("c")
        d = (
            m.join(F.broadcast(cents), "pos")
            .groupBy("vec_id", "cl")
            .agg(F.sum(diff * diff).alias("d2"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cl"))
        assign = (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cl")
        )
        cents = (
            m.join(assign, "vec_id")
            .groupBy("cl", "pos")
            .agg(
                F.floor(
                    F.sum("q").cast("double") / F.count(F.lit(1)) + 0.5
                )
                .cast("long")
                .alias("c")
            )
        )
    sizes = assign.groupBy("cl").agg(F.count(F.lit(1)).alias("n_vecs"))
    return cents.join(sizes, "cl").select(
        "cl", "pos", "n_vecs", F.col("c").alias("centroid_micro")
    )
