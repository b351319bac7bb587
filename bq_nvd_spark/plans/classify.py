"""Learned-filter curation: a multinomial Naive Bayes text classifier
trained, applied, and evaluated entirely inside the engine.

Production curation pipelines (CCNet, LLaMA/RedPajama, FineWeb) gate
documents with a cheap learned classifier — fastText-style linear
models over token counts — trained on an in-corpus labeled split. This
module is that component's engine-native shape, as two registered
queries over one shared scoring kernel:

- ``nb_lang_confusion`` — the EVALUATION artifact: score the held-out
  split, emit the (actual, predicted) confusion matrix a curation
  engineer reads before trusting the filter.
- ``nb_confidence_filter`` — the FILTER act itself: gate held-out
  documents on the classifier's decision margin (top-1 minus top-2
  posterior, in exact micro-units) and report the kept/dropped census
  per actual class — the artifact that says how much corpus a given
  confidence threshold costs.

Exactness contract: Naive Bayes needs log-probabilities, and floating
SUM order is engine-dependent, so every log-likelihood and log-prior is
quantized to INTEGER micro-units (``floor(ln(p) * 1e6 + 0.5)``) before
any aggregation — per-document scores are exact integer sums, and the
argmax/margin (ties broken by class name) are hash-identical
cross-engine. The one float op outside +,*,/ is ``ln`` of an
exactly-representable rational; both engines' ln agree to <=1 ulp,
which is ~1e-10 of a micro-unit after scaling — far below the floor
boundary.

Scale shape (100 TB): training is ONE corpus tokenize + (class, term)
aggregate (checkpointed — see ``_nb_scores``); the model vocabulary is
CAPPED at the top ``NB_VOCAB_K`` terms by document frequency (ties
broken by term name — deterministic in both engines), so the
vocab x classes likelihood grid is LIMIT-BOUNDED by construction and
its broadcast to the scorer can never grow with the corpus — raw
vocabulary is data-proportional under Heaps' law, and an uncapped grid
broadcast would be a driver OOM at real corpus scale. (fastText-style
curation filters all train on a frequency-capped vocabulary; the
uncapped tail carries near-zero class evidence anyway.) Scoring is one
held-out token explode + a broadcast join + one (doc, class)
aggregate; held-out terms outside the capped vocabulary are OOV and
carry no evidence. The argmax/margin window partitions by doc_id —
maximal key cardinality, never a global sort.

Reference scope: the reference engine (redteam-project/bq-nvd) has no
learned-classifier surface; this is part of the driver-mandated
training-data-pipeline extension layer (SURVEY.md section 2.11, E11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bq_nvd_spark.operators.checkpoint import stage_checkpoint
from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.plans.sampling import _DUCK_BUCKET, TRAIN_END, _spark_bucket
from bq_nvd_spark.sources.tables import load_table

#: log-prob quantization: integer micro-units make score sums exact.
NB_MICRO = 1_000_000
#: decision-margin gate for the confidence filter, in micro-units
#: (0.75 nats between the top-1 and top-2 posterior).
NB_MARGIN_MICRO = 750_000
#: model-vocabulary budget: top-K terms by document frequency (ties by
#: term name). Makes the vocab x classes likelihood broadcast
#: LIMIT-BOUNDED regardless of corpus size — raw vocabulary grows with
#: the data (Heaps' law), a fixed budget does not. The driver fixture's
#: 31-term lexicon sits far below the cap, so fixture results are
#: unchanged; the binding-cap path is pinned by
#: tests/test_classify_privacy.py::test_nb_vocab_cap_drops_rare_terms.
NB_VOCAB_K = 4096


def _micro_ln(x: "F.Column") -> "F.Column":
    """``floor(ln(x) * 1e6 + 0.5)`` as long — THE quantization every NB
    log-prob uses (likelihoods and priors, split and CV kernels). One
    definition per engine so a smoothing/quantization change cannot
    desynchronize the models whose quality is being compared."""
    return F.floor(F.log(x) * NB_MICRO + 0.5).cast("long")


def _sql_micro_ln(arg: str) -> str:
    """The SQL twin of ``_micro_ln``."""
    return f"CAST(FLOOR(LN({arg}) * {NB_MICRO} + 0.5) AS BIGINT)"


# Shared oracle prefix: everything through the ranked per-(doc, class)
# scores. The SQL twin of ``_nb_scores`` — keeping both engines' kernel
# in one template each means a model change cannot desynchronize the
# two consumers (same discipline as the BM25 multi-query prefix).
_NB_ORACLE_PREFIX = f"""
    WITH docs AS (
      SELECT doc_id, lang, text, {_DUCK_BUCKET} AS bucket FROM documents
    ),
    train AS (SELECT * FROM docs WHERE bucket < {TRAIN_END}),
    held AS (SELECT * FROM docs WHERE bucket >= {TRAIN_END}),
    ttr AS (
      SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS term
      FROM train
    ),
    cnt AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_part
      FROM ttr GROUP BY lang, term
    ),
    -- vocab cap: top NB_VOCAB_K terms by train document frequency
    -- (each doc has one lang, so per-class distinct-doc counts sum to
    -- the term's df), ties by term name — limit-bounded grid spine
    vocab AS (
      SELECT term FROM (
        SELECT term, SUM(df_part) AS df FROM cnt GROUP BY term
      ) ORDER BY df DESC, term LIMIT {NB_VOCAB_K}
    ),
    cntv AS (SELECT c.* FROM cnt c JOIN vocab v ON v.term = c.term),
    -- class spine from the UNCAPPED counts: a class whose every term
    -- lost the vocab budget keeps Laplace-smoothed grid rows (tot=0)
    -- instead of silently vanishing from the model — the same
    -- ignorant-class-pays-the-penalty rule as the CV kernel's spine
    tot AS (
      SELECT c0.lang, CAST(COALESCE(SUM(cv.c), 0) AS BIGINT) AS tot
      FROM (SELECT DISTINCT lang FROM cnt) c0
      LEFT JOIN cntv cv ON cv.lang = c0.lang
      GROUP BY c0.lang
    ),
    vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    ll AS (
      SELECT t.lang, vb.term,
             {_sql_micro_ln(
               "CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)"
               " / CAST(t.tot + vs.v AS DOUBLE)"
             )} AS ll_micro
      FROM vocab vb
      CROSS JOIN tot t
      CROSS JOIN vs
      LEFT JOIN cntv c ON c.lang = t.lang AND c.term = vb.term
    ),
    nd AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd FROM train GROUP BY lang
    ),
    ntr AS (SELECT CAST(SUM(nd) AS BIGINT) AS n FROM nd),
    prior AS (
      SELECT lang,
             {_sql_micro_ln(
               "CAST(nd AS DOUBLE) / CAST(ntr.n AS DOUBLE)"
             )} AS prior_micro
      FROM nd CROSS JOIN ntr
    ),
    tte AS (
      SELECT doc_id, lang AS actual_lang,
             UNNEST(string_split(text, ' ')) AS term
      FROM held
    ),
    tf AS (
      SELECT doc_id, actual_lang, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tte GROUP BY doc_id, actual_lang, term
    ),
    part AS (
      SELECT f.doc_id, f.actual_lang, l.lang AS pred_lang,
             CAST(SUM(f.tf * l.ll_micro) AS BIGINT) AS s
      FROM tf f
      JOIN ll l ON l.term = f.term
      GROUP BY f.doc_id, f.actual_lang, l.lang
    ),
    scores AS (
      SELECT p0.doc_id, p0.actual_lang, p0.pred_lang,
             p0.s + pr.prior_micro AS score_micro
      FROM part p0
      JOIN prior pr ON pr.lang = p0.pred_lang
    ),
    pred AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY score_micro DESC, pred_lang) AS rn
      FROM scores
    )"""


def _nb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared NB kernel: train on the md5-bucket train split, score the
    held-out split; returns ranked per-(doc, class) integer scores
    ``(doc_id, actual_lang, pred_lang, score_micro, rn)``.

    Memoized per (application, sf_dir) via ``shared_stage`` — both E11
    consumers (confusion matrix, confidence filter) read the same
    materialized relation, so a session pass trains the model and
    scores the held-out split ONCE (the same N-consumers-of-one-
    expensive-stage shape as the dedup chain; at 100 TB the second
    full-lake training scan disappears).
    """
    from bq_nvd_spark.operators.checkpoint import shared_stage

    return shared_stage(
        spark,
        ("nb_scores", sf_dir),
        lambda: _build_nb_scores(spark, sf_dir),
    )


def _build_nb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kernel's build pipeline (see ``_nb_scores`` for the memo).

    Laplace +1 smoothing over the top-``NB_VOCAB_K``-by-document-
    frequency train vocabulary (ties by term name); held-out terms
    outside that vocabulary are dropped (standard multinomial NB — an
    OOV term carries no class evidence), and a held-out document with
    NO in-vocab terms is unclassifiable and excluded — identically in
    both engines, so the exclusion is oracle-checked too.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", _spark_bucket().alias("bucket")
    )
    train = docs.filter(F.col("bucket") < TRAIN_END)
    held = docs.filter(F.col("bucket") >= TRAIN_END)

    ttr = train.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    # tot / vocab / vsize derive from the (class, term) counts — ONE
    # corpus-sized tokenize+aggregate feeds the whole model (df_part
    # rides along in the same shuffle: each doc has one lang, so
    # per-class distinct-doc counts sum to the term's train df). The
    # checkpoint makes that literal: cnt is consumed by four branches
    # (vocab cap, grid left join, class totals, cap membership) and
    # Spark's exchange reuse only collapses some of them, so without it
    # the corpus explode re-executes per branch; materializing the
    # vocab×classes relation caps the 100 TB scan at one.
    cnt = stage_checkpoint(
        ttr.groupBy("lang", "term").agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.countDistinct("doc_id").cast("long").alias("df_part"),
        )
    )
    # Vocab cap: top NB_VOCAB_K by document frequency, ties by term —
    # an aggregate-side orderBy().limit() over the vocabulary relation
    # (TakeOrdered, never a corpus sort); the grid spine is now
    # LIMIT-BOUNDED, so every broadcast below has a fixed ceiling.
    vocab = (
        cnt.groupBy("term")
        .agg(F.sum("df_part").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(NB_VOCAB_K)
        .select("term")
    )
    cntv = cnt.join(F.broadcast(vocab), "term")
    # Class spine from the UNCAPPED counts: a class whose every term
    # lost the vocab budget keeps Laplace-smoothed grid rows (tot=0)
    # instead of silently vanishing from the model — the same
    # ignorant-class-pays-the-penalty rule as the CV kernel's spine.
    tot = (
        cnt.select("lang")
        .distinct()
        .join(
            cntv.groupBy("lang").agg(F.sum("c").cast("long").alias("t")),
            "lang",
            "left",
        )
        .select(
            "lang",
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("tot"),
        )
    )
    vsize = vocab.agg(F.count(F.lit(1)).cast("long").alias("v"))

    # Laplace grid: every (class, capped-vocab term) pair gets a
    # likelihood, zero-count pairs included. <=NB_VOCAB_K x classes —
    # limit-bounded, broadcast the class-level relations onto the
    # vocab side.
    ll = (
        vocab.crossJoin(F.broadcast(tot))
        .join(cntv.select("lang", "term", "c"), ["lang", "term"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "lang",
            "term",
            _micro_ln(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("tot") + F.col("v")).cast("double")
            ).alias("ll_micro"),
        )
    )

    nd = train.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("nd"))
    ntr = nd.agg(F.sum("nd").cast("long").alias("n"))
    prior = nd.crossJoin(F.broadcast(ntr)).select(
        F.col("lang").alias("pred_lang"),
        _micro_ln(
            F.col("nd").cast("double") / F.col("n").cast("double")
        ).alias("prior_micro"),
    )

    tf = (
        held.select(
            "doc_id",
            F.col("lang").alias("actual_lang"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .groupBy("doc_id", "actual_lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # Broadcast the capped-vocab x classes likelihood table (limit-
    # bounded) onto the held-out
    # term frequencies: the scorer's only join, corpus never re-shuffled
    # beyond the (doc, class) aggregate.
    scores = (
        tf.join(
            F.broadcast(ll.withColumnRenamed("lang", "pred_lang")), "term"
        )
        .groupBy("doc_id", "actual_lang", "pred_lang")
        .agg(F.sum(F.col("tf") * F.col("ll_micro")).cast("long").alias("s"))
        .join(F.broadcast(prior), "pred_lang")
        .select(
            "doc_id",
            "actual_lang",
            "pred_lang",
            (F.col("s") + F.col("prior_micro")).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("pred_lang")
    )
    return scores.withColumn("rn", F.row_number().over(w))


@query(
    "nb_lang_confusion",
    oracle=_NB_ORACLE_PREFIX
    + """
    SELECT actual_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY actual_lang, pred_lang
    """,
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The evaluation artifact: (actual, predicted) confusion matrix
    over the held-out split. See ``_nb_scores`` for the kernel."""
    return (
        _nb_scores(spark, sf_dir)
        .filter(F.col("rn") == 1)
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@query(
    "nb_confidence_filter",
    oracle=_NB_ORACLE_PREFIX
    + f""",
    margins AS (
      SELECT doc_id, actual_lang,
             MAX(CASE WHEN rn = 1 THEN score_micro END) AS s1,
             MAX(CASE WHEN rn = 2 THEN score_micro END) AS s2
      FROM pred WHERE rn <= 2
      GROUP BY doc_id, actual_lang
    )
    SELECT actual_lang,
           CAST(SUM(CASE WHEN s2 IS NULL
                           OR s1 - s2 >= {NB_MARGIN_MICRO}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN s2 IS NULL
                           OR s1 - s2 >= {NB_MARGIN_MICRO}
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
    FROM margins
    GROUP BY actual_lang
    """,
)
def nb_confidence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter act: gate held-out docs on the classifier's decision
    margin (top-1 − top-2 posterior, exact micro-units) and census
    kept/dropped per actual class — how much corpus a confidence
    threshold costs, per class.

    A single-class degenerate run (no rn=2 row, s2 null) keeps the doc
    outright: with no competitor the decision is unambiguous — stated
    directly as ``s2 IS NULL OR margin >= threshold`` in both engines,
    so the semantics survive any future change to the gate comparator
    or threshold. The margin pivot runs over the ≤ 2·|held| ranked rows
    the shared kernel already produced — no new corpus-sized work
    beyond ``_nb_scores``.
    """
    ranked = _nb_scores(spark, sf_dir).filter(F.col("rn") <= 2)
    margins = ranked.groupBy("doc_id", "actual_lang").agg(
        F.max(F.when(F.col("rn") == 1, F.col("score_micro"))).alias("s1"),
        F.max(F.when(F.col("rn") == 2, F.col("score_micro"))).alias("s2"),
    )
    keep = F.col("s2").isNull() | (
        F.col("s1") - F.col("s2") >= NB_MARGIN_MICRO
    )
    return margins.groupBy("actual_lang").agg(
        F.sum(keep.cast("long")).cast("long").alias("n_kept"),
        F.sum((~keep).cast("long")).cast("long").alias("n_dropped"),
    )


# --------------------------------------------------------------------------
# E11c: one-pass k-fold cross-validation. The honest way to report a
# learned filter's quality is CV, and the naive form re-trains k times
# — k full corpus scans. The complement identity removes them: train
# counts for fold f are (global counts) − (fold f's counts), so ONE
# per-(doc, fold, class, term) tokenize feeds every fold's model, and
# the fold dimension rides along as a 5-row broadcast. Per-fold vocab,
# totals, and priors all derive from the same relation; classes with
# zero training docs for a fold are excluded (ln(0) guard — DuckDB
# errors on it, Spark yields null; neither is a model).
NB_FOLDS = 5


@query(
    "nb_kfold_accuracy",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang, text,
             ({_DUCK_BUCKET}) % {NB_FOLDS} AS fold
      FROM documents
    ),
    tf AS (
      SELECT doc_id, fold, lang AS actual_lang, term,
             CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id, fold, lang,
               UNNEST(string_split(text, ' ')) AS term
        FROM docs
      )
      GROUP BY doc_id, fold, actual_lang, term
    ),
    cnt_ft AS (
      SELECT fold, actual_lang AS lang, term,
             CAST(SUM(tf) AS BIGINT) AS c_ft
      FROM tf GROUP BY fold, lang, term
    ),
    cnt_t AS (
      SELECT lang, term, CAST(SUM(c_ft) AS BIGINT) AS c_all
      FROM cnt_ft GROUP BY lang, term
    ),
    folds AS (SELECT UNNEST(range({NB_FOLDS})) AS fold),
    langs AS (SELECT DISTINCT lang FROM cnt_t),
    -- vocab cap: top NB_VOCAB_K terms by GLOBAL document frequency
    -- (tf is unique per (doc, term), so COUNT(*) is the doc count),
    -- ties by term name — the grid spine is limit-bounded
    dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    terms AS (
      SELECT term FROM dfreq ORDER BY df DESC, term LIMIT {NB_VOCAB_K}
    ),
    grid0 AS (
      -- FULL capped-terms x langs x folds spine: a class that never
      -- saw a term must PAY the Laplace zero-count penalty, not skip
      -- it — building the grid from observed (lang, term) pairs makes
      -- ignorant classes outscore informed ones (all log-probs are
      -- negative; fewer joined rows = higher score)
      SELECT f.fold, lg.lang, tm.term,
             COALESCE(t.c_all, 0) - COALESCE(c.c_ft, 0) AS c_tr
      FROM terms tm
      CROSS JOIN langs lg
      CROSS JOIN folds f
      LEFT JOIN cnt_t t ON t.lang = lg.lang AND t.term = tm.term
      LEFT JOIN cnt_ft c
        ON c.fold = f.fold AND c.lang = lg.lang AND c.term = tm.term
    ),
    vocab_f AS (
      SELECT fold, term FROM grid0
      GROUP BY fold, term HAVING SUM(c_tr) > 0
    ),
    vs_f AS (
      SELECT fold, CAST(COUNT(*) AS BIGINT) AS v
      FROM vocab_f GROUP BY fold
    ),
    tot_f AS (
      SELECT fold, lang, CAST(SUM(c_tr) AS BIGINT) AS tot
      FROM grid0 GROUP BY fold, lang
    ),
    ll AS (
      SELECT g.fold, g.lang, g.term,
             {_sql_micro_ln(
               "CAST(g.c_tr + 1 AS DOUBLE)"
               " / CAST(t.tot + v.v AS DOUBLE)"
             )} AS ll_micro
      FROM grid0 g
      JOIN vocab_f vb ON vb.fold = g.fold AND vb.term = g.term
      JOIN tot_f t ON t.fold = g.fold AND t.lang = g.lang
      JOIN vs_f v ON v.fold = g.fold
    ),
    nd_f0 AS (
      SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n_fl
      FROM docs GROUP BY fold, lang
    ),
    nd_all AS (
      SELECT lang, CAST(SUM(n_fl) AS BIGINT) AS n_l
      FROM nd_f0 GROUP BY lang
    ),
    nd AS (
      SELECT f.fold, a.lang, a.n_l - COALESCE(d.n_fl, 0) AS nd
      FROM nd_all a
      CROSS JOIN folds f
      LEFT JOIN nd_f0 d ON d.fold = f.fold AND d.lang = a.lang
    ),
    nd_pos AS (SELECT * FROM nd WHERE nd > 0),
    ntr AS (
      SELECT fold, CAST(SUM(nd) AS BIGINT) AS n FROM nd_pos GROUP BY fold
    ),
    prior AS (
      SELECT p.fold, p.lang,
             {_sql_micro_ln(
               "CAST(p.nd AS DOUBLE) / CAST(t.n AS DOUBLE)"
             )} AS prior_micro
      FROM nd_pos p JOIN ntr t ON t.fold = p.fold
    ),
    scores AS (
      SELECT f.doc_id, f.fold, f.actual_lang, l.lang AS pred_lang,
             CAST(SUM(f.tf * l.ll_micro) AS BIGINT)
               + ANY_VALUE(p.prior_micro) AS score_micro
      FROM tf f
      JOIN ll l ON l.fold = f.fold AND l.term = f.term
      JOIN prior p ON p.fold = f.fold AND p.lang = l.lang
      GROUP BY f.doc_id, f.fold, f.actual_lang, l.lang
    ),
    pred AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY score_micro DESC, pred_lang) AS rn
      FROM scores
    )
    SELECT fold,
           CAST(SUM(CASE WHEN actual_lang = pred_lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(COUNT(*) AS BIGINT) AS n_scored
    FROM pred WHERE rn = 1
    GROUP BY fold
    """,
)
def nb_kfold_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-fold-out cross-validation in ONE corpus pass.

    Complement identity: fold f's training counts = global − fold f's
    own, so the per-(doc, fold, class, term) tf relation (checkpointed
    — the single corpus-sized tokenize) feeds every fold's model;
    the fold dimension is a 5-row broadcast on a limit-bounded grid
    (top-``NB_VOCAB_K``-by-df capped vocabulary),
    never a corpus re-scan. Each document scores against its OWN
    fold's model (join on (fold, term) against the broadcast
    likelihood grid), priors exclude zero-doc (fold, class) cells, and
    the output is the per-fold (n_correct, n_scored) census — the CV
    table a curation engineer quotes.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        (_spark_bucket() % NB_FOLDS).alias("fold"),
    )
    tf = stage_checkpoint(
        docs.select(
            "doc_id",
            "fold",
            F.col("lang").alias("actual_lang"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .groupBy("doc_id", "fold", "actual_lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # cnt_ft is consumed by cnt_t, the grid spine's two distincts, and
    # the grid left join — checkpoint the folds x classes x vocab
    # relation (tiny) so the corpus-sized aggregation of tf runs once;
    # tf itself is then scanned only here and in the scores join.
    cnt_ft = stage_checkpoint(
        tf.groupBy("fold", F.col("actual_lang").alias("lang"), "term").agg(
            F.sum("tf").cast("long").alias("c_ft")
        )
    )
    cnt_t = cnt_ft.groupBy("lang", "term").agg(
        F.sum("c_ft").cast("long").alias("c_all")
    )
    folds = spark.range(NB_FOLDS).select(F.col("id").cast("int").alias("fold"))
    # Vocab cap: top NB_VOCAB_K by GLOBAL document frequency (tf is
    # unique per (doc, term), so count(*) is the doc count), ties by
    # term — the grid spine, and with it every broadcast below, is
    # limit-bounded. Raw vocabulary is data-proportional (Heaps' law);
    # an uncapped fold x vocab x classes broadcast would OOM the driver
    # at real corpus scale.
    terms = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(NB_VOCAB_K)
        .select("term")
    )
    # FULL capped-terms x langs x folds spine: a class that never saw
    # a term must PAY the Laplace zero-count penalty, not skip it —
    # building the grid from observed (lang, term) pairs makes ignorant
    # classes outscore informed ones (all log-probs are negative; fewer
    # joined rows = higher score). Caught by the separable-corpus test;
    # the oracle mirrored the same algebra, so parity alone never would.
    grid0 = (
        terms
        .crossJoin(F.broadcast(cnt_t.select("lang").distinct()))
        .crossJoin(F.broadcast(folds))
        .join(cnt_t, ["lang", "term"], "left")
        .join(cnt_ft, ["fold", "lang", "term"], "left")
        .select(
            "fold",
            "lang",
            "term",
            (
                F.coalesce(F.col("c_all"), F.lit(0))
                - F.coalesce(F.col("c_ft"), F.lit(0))
            ).alias("c_tr"),
        )
    )
    vocab_f = (
        grid0.groupBy("fold", "term")
        .agg(F.sum("c_tr").alias("s"))
        .filter(F.col("s") > 0)
        .select("fold", "term")
    )
    vs_f = vocab_f.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    tot_f = grid0.groupBy("fold", "lang").agg(
        F.sum("c_tr").cast("long").alias("tot")
    )
    ll = (
        grid0.join(vocab_f, ["fold", "term"])
        .join(F.broadcast(tot_f), ["fold", "lang"])
        .join(F.broadcast(vs_f), ["fold"])
        .select(
            "fold",
            "lang",
            "term",
            _micro_ln(
                (F.col("c_tr") + 1).cast("double")
                / (F.col("tot") + F.col("v")).cast("double")
            ).alias("ll_micro"),
        )
    )
    nd_f0 = docs.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_fl")
    )
    nd_all = nd_f0.groupBy("lang").agg(
        F.sum("n_fl").cast("long").alias("n_l")
    )
    nd = (
        nd_all.crossJoin(F.broadcast(folds))
        .join(nd_f0, ["fold", "lang"], "left")
        .select(
            "fold",
            "lang",
            (F.col("n_l") - F.coalesce(F.col("n_fl"), F.lit(0))).alias("nd"),
        )
        .filter(F.col("nd") > 0)
    )
    ntr = nd.groupBy("fold").agg(F.sum("nd").cast("long").alias("n"))
    prior = nd.join(F.broadcast(ntr), "fold").select(
        "fold",
        "lang",
        _micro_ln(
            F.col("nd").cast("double") / F.col("n").cast("double")
        ).alias("prior_micro"),
    )
    scores = (
        tf.join(
            F.broadcast(ll.withColumnRenamed("lang", "pred_lang")),
            ["fold", "term"],
        )
        .groupBy("doc_id", "fold", "actual_lang", "pred_lang")
        .agg(F.sum(F.col("tf") * F.col("ll_micro")).cast("long").alias("s"))
        .join(
            F.broadcast(prior.withColumnRenamed("lang", "pred_lang")),
            ["fold", "pred_lang"],
        )
        .select(
            "doc_id",
            "fold",
            "actual_lang",
            "pred_lang",
            (F.col("s") + F.col("prior_micro")).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("pred_lang")
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("fold")
        .agg(
            F.sum(
                (F.col("actual_lang") == F.col("pred_lang")).cast("long")
            )
            .cast("long")
            .alias("n_correct"),
            F.count(F.lit(1)).cast("long").alias("n_scored"),
        )
    )


# --------------------------------------------------------------------------
# E11d (round 14): bigram-LM perplexity scoring — the OTHER classic
# learned curation gate. CCNet (Wenzek et al. 2019) buckets a crawled
# corpus into head/middle/tail by the perplexity of a language model
# trained on a trusted split, and downstream pipelines keep the
# low-perplexity buckets; this is that component's engine-native shape:
# an add-one-smoothed bigram LM trained on the md5-bucket train split,
# scoring every held-out document.
#
# - ``lm_doc_perplexity`` — the per-document score artifact: bigram
#   count, total negative log-likelihood (exact integer micro-nats),
#   and the average NLL a threshold gates on.
# - ``lm_ppl_bucket_census`` — the CCNet bucket census: head/middle/
#   tail per language, assigned by EXACT integer cross-multiplication
#   (nll_micro <= n_bigrams * threshold) so no float enters the
#   decision. Production sets the thresholds from corpus terciles; the
#   constants here split the fixture non-degenerately at every SF.
#
# Scale shape (100 TB): the trained model IS the (w1, w2) count
# relation — bigram and unigram types are data-proportional (the same
# Heaps'-law growth the NB vocab cap guards against), so the model is
# NEVER broadcast: held-out bigrams reach it through plain shuffle
# equi-joins on (w1, w2) and (w1) — the distributed KenLM shape, counts
# stay sharded. Only the one-row vocabulary size rides a broadcast.
# The train bigram census is stage-checkpointed: the unigram relation,
# the vocab size, and the score join all derive from it, so the
# corpus-sized train explode runs once.
LM_PPL_HEAD_MICRO = 3_400_000  # avg NLL <= 3.40 nats -> head
LM_PPL_TAIL_MICRO = 3_430_000  # avg NLL  > 3.43 nats -> tail

_LM_ORACLE_PREFIX = f"""
    WITH docs AS (
      SELECT doc_id, lang, text, {_DUCK_BUCKET} AS bucket FROM documents
    ),
    train AS (SELECT * FROM docs WHERE bucket < {TRAIN_END}),
    held AS (SELECT * FROM docs WHERE bucket >= {TRAIN_END}),
    tb AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT string_split(text, ' ') AS toks FROM train),
           UNNEST(range(1, len(toks))) AS t(i)
    ),
    big AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM tb GROUP BY w1, w2
    ),
    uni AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM big GROUP BY w1
    ),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
    hb AS (
      SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM held),
           UNNEST(range(1, len(toks))) AS t(i)
    ),
    sc AS (
      SELECT h.doc_id, h.lang,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(-{_sql_micro_ln(
               "CAST(COALESCE(b.c2, 0) + 1 AS DOUBLE)"
               " / CAST(COALESCE(u.c1, 0) + v.v AS DOUBLE)"
             )}) AS BIGINT) AS nll_micro
      FROM hb h
      LEFT JOIN big b ON b.w1 = h.w1 AND b.w2 = h.w2
      LEFT JOIN uni u ON u.w1 = h.w1
      CROSS JOIN v
      GROUP BY h.doc_id, h.lang
    )"""


def _lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared bigram-LM kernel: per-held-doc ``(doc_id, lang,
    n_bigrams, nll_micro)``. Memoized via ``shared_stage`` — both E11d
    consumers score the corpus once (same discipline as ``_nb_scores``).
    """
    from bq_nvd_spark.operators.checkpoint import shared_stage

    return shared_stage(
        spark,
        ("lm_scores", sf_dir),
        lambda: _build_lm_scores(spark, sf_dir),
    )


def _build_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kernel's build pipeline (see ``_lm_scores`` for the memo).

    Add-one smoothing over the train bigram table: an unseen
    continuation scores ln(1 / (c(w1) + V)), an unseen HISTORY
    ln(1 / V) — every held-out bigram gets a defined probability, so
    no document is excluded (unlike the NB kernels, where an
    all-OOV doc has no evidence at all). A held doc with < 2 tokens
    has no bigrams and is absent, identically in both engines.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", _spark_bucket().alias("bucket")
    )
    bigrams = F.explode(
        F.expr(
            "transform(sequence(0, size(toks) - 2),"
            " i -> struct(element_at(toks, i + 1) AS w1,"
            " element_at(toks, i + 2) AS w2))"
        )
    )

    def _pairs(side: DataFrame, *keep: str) -> DataFrame:
        toks = side.select(
            *keep, F.split("text", " ").alias("toks")
        ).filter(F.size("toks") >= 2)
        return toks.select(*keep, bigrams.alias("bg")).select(
            *keep, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )

    tb = _pairs(docs.filter(F.col("bucket") < TRAIN_END))
    big = stage_checkpoint(
        tb.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("long").alias("c2")
        )
    )
    uni = big.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    v = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))

    hb = _pairs(
        docs.filter(F.col("bucket") >= TRAIN_END), "doc_id", "lang"
    )
    return (
        hb.join(big, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "lang",
            (
                -_micro_ln(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast(
                        "double"
                    )
                )
            ).alias("neg_ll"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("neg_ll").cast("long").alias("nll_micro"),
        )
    )


@query(
    "lm_doc_perplexity",
    oracle=_LM_ORACLE_PREFIX
    + """
    SELECT doc_id, lang, n_bigrams, nll_micro,
           CAST(FLOOR(CAST(nll_micro AS DOUBLE)
                      / CAST(n_bigrams AS DOUBLE) + 0.5) AS BIGINT)
             AS avg_nll_micro
    FROM sc
    """,
)
def lm_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-held-document bigram-LM negative log-likelihood (exact
    integer micro-nats) and its half-up-rounded per-bigram average —
    the score a CCNet-style perplexity gate thresholds on. The average
    divides two exact integers far below 2^53, so the double division
    and FLOOR agree cross-engine bit-for-bit."""
    sc = _lm_scores(spark, sf_dir)
    return sc.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "nll_micro",
        F.floor(
            F.col("nll_micro").cast("double")
            / F.col("n_bigrams").cast("double")
            + 0.5
        )
        .cast("long")
        .alias("avg_nll_micro"),
    )


@query(
    "lm_ppl_bucket_census",
    oracle=_LM_ORACLE_PREFIX
    + f"""
    SELECT lang,
           CASE WHEN nll_micro <= n_bigrams * {LM_PPL_HEAD_MICRO}
                THEN 'head'
                WHEN nll_micro <= n_bigrams * {LM_PPL_TAIL_MICRO}
                THEN 'middle'
                ELSE 'tail' END AS ppl_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM sc
    GROUP BY lang, ppl_bucket
    """,
)
def lm_ppl_bucket_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet head/middle/tail census per language: bucket
    membership by exact integer cross-multiplication against the two
    avg-NLL thresholds — no float in the decision — over the shared
    scored relation (no new corpus-sized work beyond ``_lm_scores``)."""
    sc = _lm_scores(spark, sf_dir)
    bucket = (
        F.when(
            F.col("nll_micro")
            <= F.col("n_bigrams") * LM_PPL_HEAD_MICRO,
            "head",
        )
        .when(
            F.col("nll_micro")
            <= F.col("n_bigrams") * LM_PPL_TAIL_MICRO,
            "middle",
        )
        .otherwise("tail")
    )
    return (
        sc.select("lang", bucket.alias("ppl_bucket"))
        .groupBy("lang", "ppl_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


@query(
    "lm_ppl_tercile_cutoffs",
    oracle=_LM_ORACLE_PREFIX
    + """,
    av AS (
      SELECT CAST(FLOOR(CAST(nll_micro AS DOUBLE)
                        / CAST(n_bigrams AS DOUBLE) + 0.5) AS BIGINT) AS a
      FROM sc
    ),
    r AS (
      SELECT a, ROW_NUMBER() OVER (ORDER BY a) AS rn,
             COUNT(*) OVER () AS n
      FROM av
    )
    SELECT p.pct,
           MAX(CASE WHEN r.rn = (p.num * r.n + 2) // 3
                    THEN r.a END) AS avg_nll_micro
    FROM r CROSS JOIN (VALUES ('t33', 1), ('t66', 2)) p(pct, num)
    GROUP BY p.pct
    """,
)
def lm_ppl_tercile_cutoffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact avg-NLL tercile cutoffs over the held-out corpus —
    how CCNet actually SETS the head/middle/tail thresholds that
    ``lm_ppl_bucket_census`` consumes as constants: values at ranks
    ⌈n/3⌉ and ⌈2n/3⌉ of the per-doc average NLL.

    Selection runs through ``operators/rank_select.exact_rank_values``
    (histogram-refinement: aggregate + a few map-side-combined cell
    scans, driver state census-bounded) — no global sort, no
    un-partitioned Window; the oracle's ROW_NUMBER form picks the same
    tie-independent element. The scored relation is the memoized
    ``_lm_scores``, so this adds no corpus-sized work beyond the
    kernel the census already pays for.
    """
    from bq_nvd_spark.operators.rank_select import exact_rank_values

    av = _lm_scores(spark, sf_dir).select(
        F.floor(
            F.col("nll_micro").cast("double")
            / F.col("n_bigrams").cast("double")
            + 0.5
        )
        .cast("long")
        .alias("a")
    )
    cuts = exact_rank_values(
        av,
        "a",
        lambda n: {"t33": (n + 2) // 3, "t66": (2 * n + 2) // 3},
    ).get(None, {})
    return spark.createDataFrame(
        sorted((k, int(v)) for k, v in cuts.items()),
        "pct string, avg_nll_micro long",
    )
