"""Exact duplicated-SPAN detection across the corpus (substring dedup).

Document-level dedup (exact / MinHash / SimHash in ``plans/llm.py``)
misses the dominant contamination mode in web-scale training data:
long verbatim passages repeated across otherwise-distinct documents
(boilerplate, licenses, quoted articles). The published remedy
(suffix-array dedup, "Deduplicating Training Data Makes Language
Models Better") is a single-machine construction; the Spark-native
equivalent used here is fixed-length token n-gram spans:

1. tokenize, emit every ``SPAN_N``-token rolling window per document;
2. hash each span to a 64-bit key (``xxhash64``) so the shuffle moves
   ``(long, long)`` rows, never the span text;
3. one hash aggregation finds spans occurring in >= 2 distinct
   documents (map-side partial agg absorbs the Zipfian head);
4. join the duplicated-span keys back to per-document positions.

Every stage is explode -> hash-agg -> equi-join: linear in corpus
size, no pairwise comparison anywhere, so the shape survives 100 TB
(the reference engine has no analogue; EXT scope per SURVEY.md §2.11
E2). The 64-bit key space makes cross-span collisions ~1e-9 at a
billion distinct spans — the standard trade the MinHash/Jaccard
stack in ``plans/llm.py`` already makes.

Oracle note: DuckDB joins on the span STRING (its hash() differs from
xxhash64) — only the doc-keyed outputs surface, so internal join keys
never need to match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table

SPAN_N = 8  # tokens per span; the dedup granularity

_DUCK_GRAMS = f"""
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents
      WHERE len(string_split(text, ' ')) >= {SPAN_N}
    ),
    grams AS (
      SELECT doc_id,
             UNNEST(list_transform(
               range(0, len(t) - {SPAN_N} + 1),
               i -> array_to_string(
                 t[CAST(i + 1 AS BIGINT):CAST(i + {SPAN_N} AS BIGINT)], ' ')
             )) AS g
      FROM toks
    ),
    dup AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    )
"""


def _span_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, span_key) for every SPAN_N-token rolling window.

    The window enumeration runs as a ``transform(sequence(...))`` HOF —
    per-row work over an already-loaded token array (no shuffle); the
    emitted key is the 64-bit hash, so everything downstream shuffles
    fixed-width longs.
    """
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= SPAN_N
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {SPAN_N}),"
                f" i -> xxhash64(concat_ws(' ', slice(t, i + 1, {SPAN_N}))))"
            )
        ).alias("span_key"),
    )


@query(
    "duplicate_span_docs",
    oracle=f"""
    WITH {_DUCK_GRAMS}
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans
    FROM grams JOIN dup USING (g)
    GROUP BY doc_id
    """,
)
def duplicate_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document count of spans shared verbatim with another document.

    The downstream curation decision (excise the span, drop the doc,
    or down-weight it) keys off exactly this count. Plan: explode to
    (doc_id, span_key) longs, hash-agg for the duplicated key set,
    equi-join back, count per doc — three shuffles, all on longs.
    """
    grams = _span_keys(load_table(spark, sf_dir, "documents"))
    dup = (
        grams.groupBy("span_key")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span_key")
    )
    return (
        grams.join(dup, "span_key")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_spans"))
    )


@query(
    "span_contamination_census",
    oracle=f"""
    WITH {_DUCK_GRAMS}
    SELECT CAST(COUNT(*) AS BIGINT)                    AS n_dup_span_kinds,
           CAST(SUM(occ) AS BIGINT)                    AS n_dup_occurrences,
           CAST(MAX(nd) AS BIGINT)                     AS max_docs_per_span
    FROM (
      SELECT g, COUNT(*) AS occ, COUNT(DISTINCT doc_id) AS nd
      FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    )
    """,
)
def span_contamination_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-span summary (the dedup go/no-go dial).

    One explode + one two-level hash aggregation; the final reduce is a
    single-row global agg over the (already small) duplicated-span
    relation. Distinct-doc counting per span is exact — the span-key
    relation is (long, long) rows, so even the Zipfian head is cheap.
    """
    grams = _span_keys(load_table(spark, sf_dir, "documents"))
    per_span = (
        grams.groupBy("span_key")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.count_distinct("doc_id").alias("nd"),
        )
        .filter(F.col("nd") >= 2)
    )
    return per_span.agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_span_kinds"),
        F.sum("occ").cast("long").alias("n_dup_occurrences"),
        F.max("nd").cast("long").alias("max_docs_per_span"),
    )
