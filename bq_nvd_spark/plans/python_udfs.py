"""§2.10 Python extension surface — pandas_udf / applyInPandas / mapInPandas.

The reference delegates everything non-SQL to its host warehouse; this
engine's equivalent escape hatch is Arrow-batched Python. These queries
exercise each of the three shapes over the ``documents`` table:

- scalar ``pandas_udf``             — language ID, BPE-ish token counts
  (``operators/text.py``)
- grouped-map ``applyInPandas``     — per-language corpus profile
- ``mapInPandas`` (1:1 and 1:N)     — multimodal decode + frame sampling
  (``operators/multimodal.py``)

Every computation is exact integer math (or carried values), so despite
running in Python the results hash-match a pure-SQL DuckDB oracle — the
correctness gate covers the UDF plumbing itself: Arrow schema mapping,
batch iteration, grouped-map key handling, and 1:N fan-out.

Scale notes (100 TB): all five are per-row or per-group projections with
no shuffle beyond the one grouped-map exchange; payloads are projected
down to scalars inside the Python stage so no binary column ever enters
a shuffle. ``applyInPandas`` materializes each group in one pandas frame
— fine for bounded groups (languages), never for unbounded keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bq_nvd_spark.operators.multimodal import decode_media, frame_sample
from bq_nvd_spark.operators.text import (
    bpe_token_count,
    langid_predict,
    langid_predict_sql,
)
from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# E5a: mapInPandas decode — one feature row per media row.
@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)                        AS n_bytes,
           16 + ascii(substr(text, 1, 1)) % 16                 AS width,
           16 + ascii(substr(text, CAST(length(text) AS INTEGER), 1)) % 16
                                                               AS height,
           (list_reduce(
              list_transform(range(1, length(text) + 1),
                             i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT)),
              (a, c) -> a + c) * 100) // length(text)          AS mean_byte_x100
    FROM documents
    WHERE length(text) > 0
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed features via Arrow-batched fake decode.

    The payload is the UTF-8 encoding of ASCII text, so byte values equal
    character codes and the oracle can recompute every feature in SQL.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return decode_media(media)


# --------------------------------------------------------------------------
# E5b: mapInPandas frame sampling — 1:N fan-out.
@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(ascii(substr(text, CAST(frame_idx * 32 + 1 AS INTEGER), 1)) AS BIGINT)
                                     AS frame_val
    FROM (
      SELECT doc_id, text,
             UNNEST(range(0, (length(text) + 31) // 32)) AS frame_idx
      FROM documents
      WHERE length(text) > 0
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return frame_sample(media)


# --------------------------------------------------------------------------
# E4e: scalar pandas_udf language ID, evaluated against the labels.
@query(
    "langid_ngram_pred",
    oracle=f"""
    SELECT lang, {langid_predict_sql("text")} AS pred_lang, COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
)
def langid_ngram_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", langid_predict("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# E4f: scalar pandas_udf BPE-ish token counting.
@query(
    "bpe_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_token_count("text").alias("n_bpe_tokens"))


# --------------------------------------------------------------------------
# §2.10 grouped-map: applyInPandas per-language corpus profile.
_PROFILE_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_docs", LongType()),
        StructField("total_chars", LongType()),
        StructField("max_chars", LongType()),
        StructField("top_doc", LongType()),
    ]
)


def _lang_profile(pdf: pd.DataFrame) -> pd.DataFrame:
    """One profile row per language group; top_doc is the smallest doc_id
    among the longest documents (deterministic tie-break)."""
    mx = int(pdf["n_chars"].max())
    top = int(pdf.loc[pdf["n_chars"] == mx, "doc_id"].min())
    return pd.DataFrame(
        [
            (
                pdf["lang"].iloc[0],
                len(pdf),
                int(pdf["n_chars"].sum()),
                mx,
                top,
            )
        ],
        columns=[f.name for f in _PROFILE_SCHEMA.fields],
    )


@query(
    "lang_group_profile",
    oracle="""
    WITH g AS (
      SELECT lang,
             COUNT(*)                     AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             MAX(n_chars)                 AS max_chars
      FROM documents
      GROUP BY lang
    )
    SELECT g.lang, g.n_docs, g.total_chars, g.max_chars,
           MIN(d.doc_id) AS top_doc
    FROM g
    JOIN documents d ON d.lang = g.lang AND d.n_chars = g.max_chars
    GROUP BY g.lang, g.n_docs, g.total_chars, g.max_chars
    """,
)
def lang_group_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    return docs.groupBy("lang").applyInPandas(_lang_profile, _PROFILE_SCHEMA)


# --------------------------------------------------------------------------
# E5c: mapInPandas resize — stride-downsampled thumbnail digest.
@query(
    "multimodal_resize_thumb",
    oracle="""
    WITH m AS (
      SELECT doc_id, text,
             greatest(length(text) // 64, 1) AS stride,
             least(64, CAST(ceil(CAST(length(text) AS DOUBLE)
                                 / greatest(length(text) // 64, 1)) AS BIGINT))
                                             AS thumb_len
      FROM documents
      WHERE length(text) > 0
    )
    SELECT doc_id,
           thumb_len,
           CAST(list_reduce(
                  list_transform(range(0, CAST(thumb_len AS INTEGER)),
                    i -> CAST(ascii(substr(text, CAST(i * stride + 1 AS INTEGER), 1))
                              AS BIGINT)),
                  (a, c) -> a + c) AS BIGINT) AS thumb_sum
    FROM m
    """,
)
def multimodal_resize_thumb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bq_nvd_spark.operators.multimodal import resize_thumb

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return resize_thumb(media)


# --------------------------------------------------------------------------
# §2.10 fourth shape: a Python UDTF (user-defined TABLE function) — the
# 1:N lateral form of the extension surface. The op is context-window
# chunking, the standard LLM pre-training prep: each document's token
# stream is cut into fixed-size windows with a stride overlap, one
# output row per window.
#
# Scale notes: a UDTF is row-at-a-time Python — the right tool when the
# per-row fan-out logic is genuinely imperative (here it is also
# expressible declaratively with sequence+slice, which the DuckDB oracle
# proves; the UDTF exists to pin the fourth Python surface end to end).
# It is still a pure per-row projection: no shuffle, and the lateral
# join never re-partitions the input.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@query(
    "udtf_token_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           k.k AS chunk_idx,
           array_to_string(
             list_slice(toks, k.k * {CHUNK_STRIDE} + 1,
                        LEAST(k.k * {CHUNK_STRIDE} + {CHUNK_TOKENS}, len(toks))),
             ' ') AS chunk,
           LEAST(k.k * {CHUNK_STRIDE} + {CHUNK_TOKENS}, len(toks))
             - k.k * {CHUNK_STRIDE} AS n_tokens
    FROM t, UNNEST(range(0, CAST(CEIL(len(toks) / {CHUNK_STRIDE}.0) AS BIGINT)))
           AS k(k)
    """,
)
def udtf_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("chunk_idx", LongType()),
            StructField("chunk", StringType()),
            StructField("n_tokens", LongType()),
        ]
    )

    @udtf(returnType=out_schema)
    class TokenChunks:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF protocol
            toks = text.split(" ")
            n = len(toks)
            k = 0
            while k * CHUNK_STRIDE < n:
                s = k * CHUNK_STRIDE
                e = min(s + CHUNK_TOKENS, n)
                yield doc_id, k, " ".join(toks[s:e]), e - s
                k += 1

    spark.udtf.register("token_chunks", TokenChunks)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_chunk_src"
    )
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM _udtf_chunk_src d,
             LATERAL token_chunks(d.doc_id, d.text) c
        """
    )


# --------------------------------------------------------------------------
# §2.10e: mapInArrow — the fourth batch shape (after pandas_udf /
# applyInPandas / mapInPandas and the row-wise UDTF): RecordBatch in,
# RecordBatch out, with NO Arrow→pandas materialization in between.
# This is the right surface when the per-batch kernel is itself
# Arrow-native (pyarrow.compute, or a C extension taking Arrow
# buffers) — pandas conversion would only add a copy per batch. The
# kernel here computes byte/codepoint/token widths per document, all
# recomputable in SQL so the oracle hash covers the Arrow plumbing:
# column access by name, compute-kernel dispatch, and batch re-assembly
# with an int32→int64 cast (DuckDB counts are BIGINT).
#
# Scale notes: pure per-batch projection — zero shuffle, streaming
# through executor memory one Arrow batch (spark.sql.execution.arrow
# .maxRecordsPerBatch) at a time; nothing is retained across batches.
@query(
    "arrow_byte_stats",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT)                   AS n_bytes,
           CAST(length(text) AS BIGINT)                   AS n_codepoints,
           CAST(len(string_split(text, ' ')) AS BIGINT)   AS n_ws_tokens
    FROM documents
    """,
)
def arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")),
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_bytes", "n_codepoints", "n_ws_tokens"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        kernel,
        schema="doc_id long, n_bytes long, n_codepoints long, n_ws_tokens long",
    )


# --------------------------------------------------------------------------
# Grouped-AGGREGATE pandas_udf — the UDAF extension point (the one §2.10
# shape the other queries here don't cover). A Series-to-scalar UDF slots
# directly into groupBy().agg() next to built-in aggregates; Spark feeds
# it each group's column as one pandas Series.
#
# The aggregate is the LOWER MEDIAN (rank (n+1)//2) — deliberately a
# holistic aggregate: it cannot be computed by any map-side partial
# combine, which is exactly when a UDAF is worth its cost (algebraic
# aggregates should stay built-in). Integer input -> integer output, so
# the driver hash covers the full grouped-agg Arrow path.
#
# Scale note (100 TB): like applyInPandas, a grouped-agg UDF
# materializes the whole group's column in memory — fine for bounded
# groups (languages), never for unbounded keys; at scale prefer
# percentile_approx (rank-error-bounded, mergeable) and keep UDAFs for
# aggregates sketches cannot express.
@query(
    "udaf_median_chars",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS BIGINT)
             AS median_chars
    FROM ranked
    GROUP BY lang
    """,
)
def udaf_median_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lower median of document length via a grouped-agg
    pandas UDF, hash-checked against the oracle's rank-based median."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def lower_median(v: pd.Series) -> int:
        import numpy as np

        a = np.sort(v.to_numpy())
        return int(a[(len(a) - 1) // 2])

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        lower_median("n_chars").alias("median_chars")
    )


# --------------------------------------------------------------------------
# Grouped-map applyInArrow — the RecordBatch-native grouped shape
# (mapInArrow's grouped sibling; completes the Arrow surface alongside
# the pandas grouped-map above). The group arrives as one pyarrow.Table
# and the kernel runs entirely in pyarrow.compute — no pandas
# materialization, no Python-object row handling.
@query(
    "arrow_group_quality",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                            AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)                        AS total_chars,
           CAST(MAX(n_chars) - MIN(n_chars) AS BIGINT)         AS char_spread,
           CAST(SUM(CASE WHEN n_chars * 10 >= 5 * 200 THEN 1 ELSE 0 END)
                AS BIGINT)                                     AS n_long_docs
    FROM documents
    GROUP BY source
    """,
)
def arrow_group_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-quality summary via ``applyInArrow``.

    Exercises the grouped RecordBatch-native path: group key handling,
    Arrow table in / Arrow table out, integer-exact kernels
    (pyarrow.compute sum/min/max and a threshold count), so the driver
    hash covers the plumbing end to end. Scale note: like every
    grouped-map shape this materializes the whole group per call —
    bounded group keys (sources) only; unbounded keys belong in plain
    grouped aggregation, which is what the oracle's SQL is.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(table: "pa.Table") -> "pa.Table":
        n_chars = table.column("n_chars")
        long_mask = pc.greater_equal(pc.multiply(n_chars, 10), 5 * 200)
        return pa.Table.from_pydict(
            {
                "source": [table.column("source")[0].as_py()],
                "n_docs": [table.num_rows],
                "total_chars": [pc.sum(n_chars).as_py()],
                "char_spread": [
                    pc.max(n_chars).as_py() - pc.min(n_chars).as_py()
                ],
                "n_long_docs": [pc.sum(pc.cast(long_mask, pa.int64())).as_py()],
            },
            schema=pa.schema(
                [
                    ("source", pa.string()),
                    ("n_docs", pa.int64()),
                    ("total_chars", pa.int64()),
                    ("char_spread", pa.int64()),
                    ("n_long_docs", pa.int64()),
                ]
            ),
        )

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return docs.groupBy("source").applyInArrow(
        kernel,
        schema=(
            "source string, n_docs long, total_chars long, "
            "char_spread long, n_long_docs long"
        ),
    )
