"""Behavioral invariants for the corpus-curation additions: the
Gopher-style repetition profile, source-mixture resampling weights,
and the mapInArrow byte-stats surface."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from bq_nvd_spark.plans.llm import (
    repetition_ngram_profile,
    source_mixture_weights,
)
from bq_nvd_spark.plans.python_udfs import arrow_byte_stats
from bq_nvd_spark.sources.tables import load_table


def test_repetition_profile_matches_python_reference(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    got = {r["doc_id"]: r for r in repetition_ngram_profile(spark, sf_dir).collect()}
    checked = 0
    for doc_id, text in docs.items():
        toks = text.split(" ")
        if len(toks) < 2:
            assert doc_id not in got
            continue
        cnt = Counter(zip(toks, toks[1:]))
        r = got[doc_id]
        total = sum(cnt.values())
        assert r["top_bigram_n"] == max(cnt.values())
        assert r["total_bigrams"] == total == len(toks) - 1
        assert r["distinct_bigrams"] == len(cnt)
        top_frac = math.floor(max(cnt.values()) / total * 10000 + 0.5) / 10000
        assert r["top_frac"] == top_frac
        assert r["is_repetitive"] == (top_frac > 0.08)
        checked += 1
    assert checked == len(got)


def test_mixture_weights_rebalance_to_uniform(spark, sf_dir):
    """weight * n_docs is (up to the fixed rounding) the same for every
    source — that is the whole point of the weights — and actual
    shares sum to 1."""
    rows = source_mixture_weights(spark, sf_dir).collect()
    assert len(rows) > 1
    total = sum(r["n_docs"] for r in rows)
    per_source_mass = [r["resample_weight"] * r["n_docs"] for r in rows]
    target = total / len(rows)
    for mass in per_source_mass:
        assert abs(mass - target) < target * 0.01
    assert abs(sum(r["actual_share"] for r in rows) - 1.0) < 1e-3


def test_arrow_byte_stats_roundtrip(spark, sf_dir):
    """mapInArrow output matches JVM-side expressions for the same
    quantities (ASCII corpus: bytes == codepoints)."""
    jvm = {
        r["doc_id"]: r
        for r in load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.octet_length("text").alias("n_bytes"),
            F.length("text").alias("n_codepoints"),
            F.size(F.split("text", " ")).alias("n_ws_tokens"),
        )
        .collect()
    }
    got = arrow_byte_stats(spark, sf_dir).collect()
    assert len(got) == len(jvm)
    for r in got:
        j = jvm[r["doc_id"]]
        assert r["n_bytes"] == j["n_bytes"]
        assert r["n_codepoints"] == j["n_codepoints"]
        assert r["n_ws_tokens"] == j["n_ws_tokens"]


def test_vocab_growth_curve_invariants(spark, sf_dir):
    """Both cumulative series are strictly positive and non-decreasing;
    the final point equals the exact corpus-wide totals; types never
    exceed tokens at any prefix (Heaps' curve lies under the diagonal)."""
    from bq_nvd_spark.plans.curation import vocab_growth_curve

    rows = sorted(
        vocab_growth_curve(spark, sf_dir).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in rows] == list(range(len(rows)))
    for prev, cur in zip(rows, rows[1:]):
        assert cur["cum_tokens"] > prev["cum_tokens"]
        assert cur["cum_types"] >= prev["cum_types"]
    for r in rows:
        assert 0 < r["cum_types"] <= r["cum_tokens"]
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    exact = toks.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("tok").alias("d")
    ).collect()[0]
    assert rows[-1]["cum_tokens"] == exact["n"]
    assert rows[-1]["cum_types"] == exact["d"]


def test_vocab_growth_pays_the_explode_once(spark, sf_dir):
    """The corpus-sized token explode is paid exactly once, into the
    checkpointed per-(bucket, token) relation: the returned plan's two
    aggregation branches both read the materialized RDD, so no Generate
    (explode) node — and no documents scan — survives into it. Without
    the checkpoint each branch replays the explode (the round-5 slim:
    11 shuffles -> 5)."""
    from bq_nvd_spark.plans.curation import vocab_growth_curve

    plan = vocab_growth_curve(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    assert "documents" not in plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_incremental_dedup_agrees_with_snapshot_buckets(spark, sf_dir):
    """A doc is flagged iff it shares an LSH bucket with a base doc —
    cross-checked against an independently computed bucket census."""
    from collections import defaultdict

    from bq_nvd_spark.plans.curation import INC_MOD, incremental_dedup_new_docs
    from bq_nvd_spark.plans.llm import _spark_bands

    buckets = defaultdict(set)
    for r in _spark_bands(spark, sf_dir).collect():
        buckets[(r["band_idx"], r["band_sig"])].add(r["doc_id"])
    expect_flagged = set()
    for members in buckets.values():
        if any(d % INC_MOD != 0 for d in members):
            expect_flagged |= {d for d in members if d % INC_MOD == 0}
    got = {
        r["doc_id"]: r["contaminated"]
        for r in incremental_dedup_new_docs(spark, sf_dir).collect()
    }
    n_incoming = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % INC_MOD == 0)
        .count()
    )
    assert len(got) == n_incoming > 0
    for doc_id, flag in got.items():
        assert doc_id % INC_MOD == 0
        assert flag == (doc_id in expect_flagged)


def test_repetition_filter_gate_and_accounting(spark, sf_dir, tmp_path):
    # 1. Driver fixture: kept+dropped accounts for every doc per
    #    source, and the gate agrees with the profile's exact rational
    #    (dup_occ * 10 > n_grams) recomputed from the profile query.
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import REP_DUP_DEN, REP_DUP_NUM

    census = {
        r.source: r
        for r in QUERIES["repetition_filter_census"](spark, sf_dir).collect()
    }
    per_src = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {s: c.n_kept + c.n_dropped for s, c in census.items()} == per_src
    prof = QUERIES["doc_repetition_profile"](spark, sf_dir).collect()
    n_dropped = sum(
        1 for r in prof if r.dup_occ * REP_DUP_DEN > r.n_grams * REP_DUP_NUM
    )
    assert sum(c.n_dropped for c in census.values()) == n_dropped > 0
    assert sum(c.n_kept for c in census.values()) > 0  # non-degenerate

    # 2. Adversarial corpus: a pathologically repetitive doc (one
    #    bigram repeated throughout) must be dropped, an all-unique-
    #    bigram doc kept, and a 1-token doc (no bigrams — Spark's
    #    sequence(0,-1) descending-sequence trap) kept vacuously.
    rows = [
        (0, " ".join(["spam"] * 40), "en", "srcA", 1),
        (1, " ".join(f"u{i}" for i in range(40)), "en", "srcA", 1),
        (2, "solo", "en", "srcB", 1),
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.source: r
        for r in QUERIES["repetition_filter_census"](
            spark, str(tmp_path)
        ).collect()
    }
    assert (got["srcA"].n_kept, got["srcA"].n_dropped) == (1, 1)
    assert (got["srcB"].n_kept, got["srcB"].n_dropped) == (1, 0)
    prof2 = {
        r.doc_id: r
        for r in QUERIES["doc_repetition_profile"](
            spark, str(tmp_path)
        ).collect()
    }
    assert prof2[0].dup_occ == prof2[0].n_grams == 39  # all duplicate
    assert prof2[0].dup_frac == 1.0
    assert prof2[1].dup_occ == 0
    assert 2 not in prof2  # no bigrams: excluded from the profile


def test_streaming_repetition_gate_equals_batch_census(spark, sf_dir):
    # Two independent implementations of one contract: the batch
    # census (explode+groupBy over (doc_id, gram)) and the streaming
    # ingest gate (stateless row-local HOF kernel + one aggregate)
    # must produce identical per-source kept/dropped counts — this
    # pins the count-partition identity (dup_occ = n_grams − |grams
    # occurring exactly once|) that the row-local form relies on.
    from bq_nvd_spark.plans import QUERIES

    batch = {
        r.source: (r.n_kept, r.n_dropped)
        for r in QUERIES["repetition_filter_census"](spark, sf_dir).collect()
    }
    streamed = {
        r.source: (r.n_kept, r.n_dropped)
        for r in QUERIES["streaming_repetition_gate"](
            spark, sf_dir
        ).collect()
    }
    assert streamed == batch


def test_gopher_gate_rules_fire_individually(spark, sf_dir, tmp_path):
    # The symbol and alphabetic rules are vacuous on the all-alphabetic
    # driver fixture, so each of the five rules is exercised here on a
    # doc constructed to fail exactly one of them; the control doc
    # passes all five. Cross-checked field-by-field with a Python
    # re-implementation of the rule arithmetic.
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import (
        GQ_MIN_STOP,
        GQ_MIN_WORDS,
    )

    # 5-char filler words keep the mean length comfortably inside
    # [4, 10] even with 'the'/'a' in the mix, so each doc fails ONLY
    # its targeted rule
    good = "the a " + " ".join(["wordy"] * (GQ_MIN_WORDS + 10))
    docs = [
        (0, good, "pass"),                                  # all rules pass
        (1, "the a " + " ".join(["wordy"] * 20), "f_word_count"),  # 22 < 30
        (2, "the a " + " ".join(["xy"] * 60), "f_mean_len"),  # mean len < 4
        (3, "the a " + " ".join(["word#"] * 60), "f_symbol"),  # 60 '#' > 62/10
        (4, "the a " + " ".join(["12345"] * 60), "f_alpha"),  # 60/62 non-alpha
        (5, " ".join(["wordy"] * (GQ_MIN_WORDS + 10)), "f_stopword"),
    ]
    assert GQ_MIN_STOP == 2  # docs above carry exactly {'the','a'}
    rows = [
        (did, text, "en", f"src_{label}", len(text))
        for did, text, label in docs
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    census = {
        r["source"]: r.asDict()
        for r in QUERIES["gopher_quality_census"](
            spark, str(tmp_path)
        ).collect()
    }
    assert census["src_pass"]["n_kept"] == 1
    fail_cols = [
        "f_word_count", "f_mean_len", "f_symbol", "f_alpha", "f_stopword",
    ]
    assert all(census["src_pass"][c] == 0 for c in fail_cols)
    for c in fail_cols:
        row = census[f"src_{c}"]
        assert row["n_kept"] == 0, c
        assert row[c] >= 1, c  # the targeted rule fired
    # the targeted failures are disjoint where intended: word_count doc
    # fails ONLY word_count, stopword doc ONLY stopword
    assert [census["src_f_word_count"][c] for c in fail_cols] == [1, 0, 0, 0, 0]
    assert [census["src_f_stopword"][c] for c in fail_cols] == [0, 0, 0, 0, 1]

    # driver-fixture sanity: the gate is non-degenerate (keeps some,
    # drops some) and profile keep flags aggregate to the census
    prof = QUERIES["doc_gopher_quality_profile"](spark, sf_dir).collect()
    kept = sum(r["keep"] for r in prof)
    assert 0 < kept < len(prof)


def test_streaming_gopher_gate_equals_batch_census(spark, sf_dir):
    # The gate is a stateless projection into one aggregate, so the
    # streamed census must equal the batch census field-for-field —
    # same contract as the repetition-gate twin.
    from bq_nvd_spark.plans import QUERIES

    cols = [
        "n_docs", "n_kept", "f_word_count", "f_mean_len",
        "f_symbol", "f_alpha", "f_stopword",
    ]
    batch = {
        r["source"]: tuple(r[c] for c in cols)
        for r in QUERIES["gopher_quality_census"](spark, sf_dir).collect()
    }
    streamed = {
        r["source"]: tuple(r[c] for c in cols)
        for r in QUERIES["streaming_gopher_gate"](spark, sf_dir).collect()
    }
    assert streamed == batch


def test_source_drift_kl_flags_the_shifted_source(spark, tmp_path):
    # Two sources with identical train-split behavior; 'shifted' swaps
    # its vocabulary entirely in the held split (a broken crawler),
    # 'stable' keeps drawing from the same tokens. The drift monitor
    # must rank shifted far above stable.
    import random

    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import _SPLIT_TRAIN_END as TRAIN_END

    rng = random.Random(3)
    import hashlib

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)

    vocab_a = [f"tok{i}" for i in range(10)]
    vocab_b = [f"new{i}" for i in range(10)]
    rows = []
    for did in range(300):
        held = bucket(did) >= TRAIN_END
        src = "stable" if did % 2 == 0 else "shifted"
        if src == "shifted" and held:
            toks = [rng.choice(vocab_b) for _ in range(30)]
        else:
            toks = [rng.choice(vocab_a) for _ in range(30)]
        rows.append((did, " ".join(toks), "en", src, 30))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.source: r
        for r in QUERIES["source_drift_kl"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {"stable", "shifted"}
    # the shifted source's every current token was unseen in training:
    # drift is the full smoothed-floor penalty, nats per token
    assert got["shifted"].drift_per_token_micro > 1_000_000  # > 1 nat
    assert got["stable"].drift_per_token_micro < 300_000  # < 0.3 nat
    assert (
        got["shifted"].drift_per_token_micro
        > 3 * got["stable"].drift_per_token_micro
    )
