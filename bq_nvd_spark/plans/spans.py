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


def _span_keys(docs: DataFrame, with_pos: bool = False) -> DataFrame:
    """(doc_id, span_key) — or (doc_id, p, span_key) with 1-based span
    start positions when ``with_pos`` — for every SPAN_N-token rolling
    window. ONE gram kernel for all four span operators.

    The window enumeration runs as a per-row HOF/explode over an
    already-loaded token array (no shuffle); the emitted key is the
    64-bit hash, so everything downstream shuffles fixed-width longs.
    """
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= SPAN_N
    )
    if not with_pos:
        return toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {SPAN_N}),"
                    f" i -> xxhash64(concat_ws(' ', slice(t, i + 1, {SPAN_N}))))"
                )
            ).alias("span_key"),
        )
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, size(t) - {SPAN_N} + 1)")
        ).alias("p"),
        F.col("t"),
    ).select(
        "doc_id",
        "p",
        F.expr(
            f"xxhash64(concat_ws(' ', slice(t, p, {SPAN_N})))"
        ).alias("span_key"),
    )


def _span_grams_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus (doc_id, span_key) relation, memoized via
    ``shared_stage`` (optimization round 17): three consumers — the
    duplicated-key build below, ``duplicate_span_docs``'s join-back
    side, and ``span_contamination_census`` — each re-ran the token
    split + rolling-window explode per session pass. Fixed-width
    (long, long) rows, one per SPAN_N-token window."""
    from bq_nvd_spark.operators.checkpoint import shared_stage

    return shared_stage(
        spark,
        ("span_grams", sf_dir),
        lambda: _span_keys(load_table(spark, sf_dir, "documents")),
    )


def _dup_span_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-wide duplicated-span key relation (span_key occurring
    in >= 2 distinct documents) — memoized via ``shared_stage`` so its
    two consumers, ``duplicate_span_docs`` and the excision transform
    ``span_excised_docs``, pay the gram explode + dedup aggregation
    once per session. (``span_contamination_census`` does NOT consume
    it: the census needs per-span distinct-doc counts, not just the
    duplicated key set, and keeps its own groupBy.)"""
    from bq_nvd_spark.operators.checkpoint import shared_stage

    def build() -> DataFrame:
        grams = _span_grams_rel(spark, sf_dir)
        return (
            grams.groupBy("span_key")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("span_key")
        )

    return shared_stage(spark, ("dup_spans", sf_dir), build)


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
    grams = _span_grams_rel(spark, sf_dir)
    return (
        grams.join(_dup_span_keys(spark, sf_dir), "span_key")
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
    grams = _span_grams_rel(spark, sf_dir)
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


# --------------------------------------------------------------------------
# E2/E4 (round 15): WINNOWING document fingerprints (Schleimer, Wilkerson
# & Aiken 2003 — the MOSS algorithm): hash every WIN_K-token k-gram,
# slide a WIN_W-wide window over the hash sequence, and keep each
# window's RIGHTMOST MINIMUM (hash, position) — a provably
# position-robust fingerprint set with expected density 2/(w+1) that
# guarantees any shared run of >= WIN_K + WIN_W - 1 tokens leaves at
# least one shared fingerprint. The local-min selection is what the
# fixed-stride span dedup above cannot give: insertions before a shared
# passage shift every stride boundary but not the winnowed minima.
#
# Exactness contract: k-gram hashes are the first 8 md5 hex chars (the
# repo-wide cross-engine hash), the rightmost-min argmin is encoded as
# ONE integer MIN aggregate — key = h*WIN_M − p, so min key sorts by
# (h ASC, p DESC) exactly, h = key div WIN_M + 1 and p = h*WIN_M − key
# recover the pair — no struct-ordering or row_number portability in
# the hot aggregate. Docs with fewer k-grams than WIN_W collapse to
# ONE window (n_wins = greatest(1, m−W+1)); the explicit clamp also
# keeps the per-k-gram window range ascending, where a raw
# sequence(lo, hi) with lo > hi would step DOWNWARD in Spark but come
# back EMPTY from DuckDB's range() — a silent cross-engine divergence.
#
# Scale shape (100 TB): the k-gram explode is linear in tokens; the
# window replication is a CONSTANT WIN_W-fold blowup feeding one
# map-side-combined (doc, window) hash aggregate; fingerprints are a
# linear DISTINCT. The pair query joins fingerprints on hash with a
# document-frequency cap (WIN_DOC_CAP, the decontamination precedent),
# so per-hash fan-out is <= CAP² and boilerplate fingerprints never
# explode the join.
WIN_K = 4  # tokens per k-gram
WIN_W = 4  # winnowing window (k-grams per window)
# Position encoder: key = h*WIN_M − p orders by (h ASC, p DESC) exactly
# while p < WIN_M. p counts k-grams in ONE document, and a Spark string
# column caps at 2 GB ≈ 2^30 tokens, so p < 2^31 is STRUCTURALLY
# guaranteed — no document can overflow this encoder. h < 2^32 (8 md5
# hex chars) keeps h*2^31 − p inside int64 (max (2^32−1)·2^31 < 2^63).
# h=0 tail (accepted, part of the hash-collision trade): a k-gram whose
# 8-hex md5 prefix is exactly 0 (~2^-32 per k-gram) encodes to the
# NEGATIVE key −p, and the decode below — identical in both engines,
# since Spark `div` and DuckDB `//` both truncate toward zero — maps it
# to (h=1, p=WIN_M+p), i.e. it is ATTRIBUTED to hash bucket 1 rather
# than 0. This is cross-engine exact (the oracle shares the decode
# verbatim) and no worse than the 32-bit truncation already merging
# distinct k-grams into one h: at ~1e13 k-grams a few thousand grams
# alias into h=1 alongside the ~2^-32·N grams that alias into every
# other bucket. Do NOT "fix" via (h+1)*WIN_M − p: that overflows int64
# at h = 2^32−1.
WIN_M = 1 << 31
WIN_DOC_CAP = 10  # fingerprint doc-frequency cap for the pair join
WIN_SHARED_MIN = 2  # min shared fingerprints to report a pair

_DUCK_WINNOW = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    kg AS (
      SELECT doc_id, i AS p,
             CAST(('0x' || substr(md5(array_to_string(t[i:i+{WIN_K - 1}],
                    ' ')), 1, 8)) AS BIGINT) AS h,
             len(t) - {WIN_K} + 1 AS m
      FROM toks, UNNEST(range(1, len(t) - {WIN_K} + 2)) AS u(i)
      WHERE len(t) >= {WIN_K}
    ),
    wins AS (
      SELECT doc_id, j, MIN(h * {WIN_M} - p) AS key
      FROM kg,
           UNNEST(range(GREATEST(1, p - {WIN_W} + 1),
                        LEAST(p, GREATEST(1, m - {WIN_W} + 1)) + 1))
             AS v(j)
      GROUP BY doc_id, j
    ),
    fp AS (
      SELECT DISTINCT doc_id, key // {WIN_M} + 1 AS h,
             (key // {WIN_M} + 1) * {WIN_M} - key AS p
      FROM wins
    )"""


def _winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared kernel: the DISTINCT (doc_id, h, p) fingerprint relation
    (plus per-doc n_kgrams via max(m) downstream). Memoized via
    ``shared_stage`` — both consumers winnow the corpus once."""
    from bq_nvd_spark.operators.checkpoint import shared_stage

    return shared_stage(
        spark,
        ("winnow_fp", sf_dir),
        lambda: _build_winnow_fingerprints(spark, sf_dir),
    )


def _build_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= WIN_K)
    )
    kg = toks.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, size(t) - {WIN_K} + 1)")
        ).alias("p"),
        F.col("t"),
        (F.size("t") - WIN_K + 1).cast("long").alias("m"),
    ).select(
        "doc_id",
        "p",
        "m",
        F.conv(
            F.substring(
                F.md5(F.expr(f"concat_ws(' ', slice(t, p, {WIN_K}))")), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    wins = (
        kg.select(
            "doc_id",
            "h",
            "p",
            F.explode(
                F.expr(
                    f"sequence(greatest(1, p - {WIN_W} + 1),"
                    f" least(p, greatest(1, m - {WIN_W} + 1)))"
                )
            ).alias("j"),
        )
        .groupBy("doc_id", "j")
        .agg(F.min(F.col("h") * WIN_M - F.col("p")).alias("key"))
    )
    return (
        wins.select(
            "doc_id",
            "key",
            (F.expr(f"key div {WIN_M}") + 1).alias("h"),
        )
        .select(
            "doc_id", "h", (F.col("h") * WIN_M - F.col("key")).alias("p")
        )
        .distinct()
    )


@query(
    "winnow_fingerprint_census",
    oracle=_DUCK_WINNOW
    + f"""
    SELECT k.doc_id,
           CAST(k.m AS BIGINT) AS n_kgrams,
           CAST(GREATEST(1, k.m - {WIN_W} + 1) AS BIGINT) AS n_windows,
           f.n_fingerprints
    FROM (SELECT DISTINCT doc_id, m FROM kg) k
    JOIN (
      -- fp is already DISTINCT (doc_id, h, p): a plain count per doc
      -- needs no (h, p) pair-encoding (h*WIN_M + p would overflow
      -- BIGINT now that WIN_M is 2^31)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints
      FROM fp GROUP BY doc_id
    ) f ON f.doc_id = k.doc_id
    """,
)
def winnow_fingerprint_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing census: k-gram count, window count, and
    selected-fingerprint count (expected density ~= 2/(w+1) of the
    k-grams — the Schleimer et al. bound the pytest pins)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= WIN_K)
        .select(
            "doc_id",
            (F.size("t") - WIN_K + 1).cast("long").alias("n_kgrams"),
        )
    )
    fp = _winnow_fingerprints(spark, sf_dir)
    counts = fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints")
    )
    return docs.join(counts, "doc_id").select(
        "doc_id",
        "n_kgrams",
        F.greatest(F.lit(1), F.col("n_kgrams") - WIN_W + 1)
        .cast("long")
        .alias("n_windows"),
        "n_fingerprints",
    )


@query(
    "winnow_shared_pairs",
    oracle=_DUCK_WINNOW
    + f"""
    , rare AS (
      SELECT h FROM (SELECT DISTINCT doc_id, h FROM fp)
      GROUP BY h HAVING COUNT(*) <= {WIN_DOC_CAP}
    ),
    fr AS (
      SELECT DISTINCT f.doc_id, f.h FROM fp f JOIN rare r ON r.h = f.h
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fr a JOIN fr b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {WIN_SHARED_MIN}
    """,
)
def winnow_shared_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= WIN_SHARED_MIN winnowed fingerprints —
    the MOSS copy-detection report. The doc-frequency cap drops
    boilerplate fingerprints BEFORE the self-join (the decontamination
    precedent), bounding per-hash fan-out at WIN_DOC_CAP²."""
    fp = _winnow_fingerprints(spark, sf_dir).select("doc_id", "h").distinct()
    rare = (
        fp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") <= WIN_DOC_CAP)
        .select("h")
    )
    fr = fp.join(rare, "h")
    a = fr.select(F.col("doc_id").alias("doc_a"), "h")
    b = fr.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= WIN_SHARED_MIN)
    )


# --------------------------------------------------------------------------
# E2 (round 15): duplicated-span EXCISION — the transform the span
# DIAGNOSTICS above exist for ("Deduplicating Training Data Makes
# Language Models Better" removes the duplicated substring, not the
# document): every token position covered by a span occurring in >= 2
# distinct documents is cut, and the surviving tokens re-join in
# position order. Documents with no duplicated span pass through
# verbatim; a document excised to nothing still appears (empty text,
# n_removed = n_tokens) via the doc spine.
#
# Scale shape: dup detection is the duplicate_span_docs plan; coverage
# expansion is a constant SPAN_N-fold explode of the (already small)
# duplicated-gram occurrence relation into a DISTINCT (doc, pos) set;
# the rebuild is one groupBy(doc) over surviving tokens with
# sort_array(struct(pos, tok)) — per-document work, never a global
# sort. The reassembled string is deterministic in both engines
# (unique positions; DuckDB string_agg ORDER BY pos is its twin).
# Hash note: the engine detects dups on xxhash64 keys while the oracle
# joins gram STRINGS — the module-header collision trade (~1e-9).
@query(
    "span_excised_docs",
    oracle=f"""
    WITH {_DUCK_GRAMS},
    pg AS (
      SELECT doc_id,
             UNNEST(range(1, len(t) - {SPAN_N} + 2)) AS p,
             len(t) AS n_tokens
      FROM toks
    ),
    pos_grams AS (
      SELECT g.doc_id, p.p AS p,
             array_to_string(t[p.p:p.p + {SPAN_N} - 1], ' ') AS g
      FROM toks g JOIN pg p ON p.doc_id = g.doc_id
    ),
    covered AS (
      SELECT DISTINCT pg.doc_id, pg.p + o.o AS pos
      FROM pos_grams pg JOIN dup d ON d.g = pg.g,
           UNNEST(range(0, {SPAN_N})) AS o(o)
    ),
    alltok AS (
      SELECT doc_id, t[i] AS tok, i AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(range(1, len(t) + 1)) AS u(i)
    ),
    kept AS (
      SELECT a.doc_id, a.tok, a.pos
      FROM alltok a LEFT JOIN covered c
        ON c.doc_id = a.doc_id AND c.pos = a.pos
      WHERE c.doc_id IS NULL
    ),
    rebuilt AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS text_clean
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(string_split(d.text, ' ')) - COALESCE(r.n_kept, 0)
                AS BIGINT) AS n_removed,
           COALESCE(r.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
    """,
)
def span_excised_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut every token covered by a cross-document duplicated span and
    re-join the survivors in position order (see the section note)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    grams = _span_keys(docs, with_pos=True)
    covered = (
        grams.join(_dup_span_keys(spark, sf_dir), "span_key")
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(p, p + {SPAN_N} - 1)")
            ).alias("pos"),
        )
        .distinct()
    )
    alltok = toks.select(
        "doc_id", F.posexplode("t").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = alltok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s["tok"],
            ),
        ).alias("text_clean"),
    )
    spine = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return spine.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )
