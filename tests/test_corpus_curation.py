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
    # driver fixture, so each of the five text rules is exercised here
    # on a doc constructed to fail exactly one of them; the control doc
    # passes all eleven. Filler words are DISTINCT per position — a
    # repeated filler would (correctly) trip the round-16 duplicate-
    # line rules, which have their own firing test below.
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import (
        GQ_MIN_STOP,
        GQ_MIN_WORDS,
        GQ_RULE_NAMES,
    )

    def fillers(n, make=lambda i: f"wor{i:02d}y"):
        # 5-6 char distinct words keep the mean length inside [4, 10]
        # even with 'the'/'a' in the mix and never repeat a line
        return " ".join(make(i) for i in range(n))

    two_char = lambda i: chr(97 + i // 26) + chr(97 + i % 26)  # noqa: E731
    docs = [
        (0, "the a " + fillers(GQ_MIN_WORDS + 10), "pass"),
        (1, "the a " + fillers(20), "f_word_count"),  # 22 < 30
        (2, "the a " + fillers(60, two_char), "f_mean_len"),  # mean < 4
        (3, "the a " + fillers(60, lambda i: f"wo#{i:02d}"), "f_symbol"),
        (4, "the a " + fillers(60, lambda i: str(10000 + i)), "f_alpha"),
        (5, fillers(GQ_MIN_WORDS + 10), "f_stopword"),
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
    all_fail_cols = [f"f_{n[3:]}" for n in GQ_RULE_NAMES]
    fail_cols = all_fail_cols[:5]  # the five text rules targeted here
    assert all(census["src_pass"][c] == 0 for c in all_fail_cols)
    for c in fail_cols:
        row = census[f"src_{c}"]
        assert row["n_kept"] == 0, c
        assert row[c] >= 1, c  # the targeted rule fired
    # the targeted failures are fully disjoint across ALL eleven rules:
    # distinct fillers mean no doc here trips a line rule
    for c in fail_cols:
        expect = [1 if d == c else 0 for d in all_fail_cols]
        assert [census[f"src_{c}"][d] for d in all_fail_cols] == expect, c

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
    from bq_nvd_spark.plans.curation import GQ_RULE_NAMES

    cols = ["n_docs", "n_kept"] + [f"f_{n[3:]}" for n in GQ_RULE_NAMES]
    batch = {
        r["source"]: tuple(r[c] for c in cols)
        for r in QUERIES["gopher_quality_census"](spark, sf_dir).collect()
    }
    streamed = {
        r["source"]: tuple(r[c] for c in cols)
        for r in QUERIES["streaming_gopher_gate"](spark, sf_dir).collect()
    }
    assert streamed == batch


def _gopher_newline_census(spark, docs):
    """Run the Gopher census kernel over (doc_id, text, source) rows
    with REAL newline segmentation — the corpus path the registered
    fixed-width queries can't exercise on the single-line fixture."""
    from bq_nvd_spark.plans.curation import (
        gopher_census_kernel,
        newline_segment_cols,
    )

    df = spark.createDataFrame(
        [(did, text, src) for did, text, src in docs],
        "doc_id long, text string, source string",
    )
    return {
        r["source"]: r.asDict()
        for r in gopher_census_kernel(
            df, newline_segment_cols
        ).collect()
    }


def test_gopher_line_rules_fire_individually(spark):
    # Each round-16 line/format rule on a newline doc built to fail it;
    # the control passes all eleven. Duplicated-paragraph docs
    # necessarily also duplicate their lines (a duplicate paragraph IS
    # duplicate lines), so the para docs assert targeted firing only;
    # the line-granularity docs additionally assert full disjointness.
    w5 = [f"wo{i:03d}" for i in range(1000)]  # distinct 5-char fillers
    w7 = [f"woro{i:03d}" for i in range(1000)]  # distinct 7-char

    def lines5(n, k, start):  # n lines of k distinct 7-char words
        return [
            " ".join(w7[start + i * k : start + (i + 1) * k])
            for i in range(n)
        ]

    doc_pass = "\n".join(
        ["the a woro900 woro901 woro902"] + lines5(11, 5, 0)
    )
    # dup LINE count fires, dup chars stay under 1/20 of line mass:
    # 4 copies of a 5-char line among 49 long distinct lines
    doc_dline = "\n".join(
        ["the a zz"] + lines5(49, 5, 100) + ["aa bb"] * 4
    )
    # ONE duplicated 40-word line among 59 short lines: 1/62 dup
    # occurrences (under 1/20) but 239/1135 duplicated chars (over)
    long_line = " ".join(w5[100:140])
    doc_dchar = "\n".join(
        ["the a cc"]
        + [" ".join(w5[140 + 2 * i : 142 + 2 * i]) for i in range(59)]
        + [long_line] * 2
    )
    para = "the a " + " ".join(w7[600:606]) + "\n" + " ".join(w7[606:614])
    para_q = " ".join(w7[620:628]) + "\n" + " ".join(w7[628:636])
    doc_dpara = "\n\n".join([para, para, para, para_q])
    doc_bullet = "\n".join(
        ["the a woro700 woro701"]
        + ["- " + " ".join(w7[704 + 4 * i : 708 + 4 * i]) for i in range(19)]
    )
    doc_ell = "\n".join(
        ["the a woro800 woro801 woro802 woro803"]
        + [
            " ".join(w5[300 + 6 * i : 306 + 6 * i])
            + ("..." if i < 8 else "")
            for i in range(19)
        ]
    )
    census = _gopher_newline_census(
        spark,
        [
            (0, doc_pass, "src_pass"),
            (1, doc_dline, "src_f_dup_line"),
            (2, doc_dchar, "src_f_dup_line_char"),
            (3, doc_dpara, "src_para"),
            (4, doc_bullet, "src_f_bullet"),
            (5, doc_ell, "src_f_ellipsis"),
        ],
    )
    from bq_nvd_spark.plans.curation import GQ_RULE_NAMES

    all_fail_cols = [f"f_{n[3:]}" for n in GQ_RULE_NAMES]
    assert census["src_pass"]["n_kept"] == 1
    assert all(census["src_pass"][c] == 0 for c in all_fail_cols)
    for c in ["f_dup_line", "f_dup_line_char", "f_bullet", "f_ellipsis"]:
        row = census[f"src_{c}"]
        assert row["n_kept"] == 0, c
        expect = [1 if d == c else 0 for d in all_fail_cols]
        assert [row[d] for d in all_fail_cols] == expect, c
    para_row = census["src_para"]
    assert para_row["n_kept"] == 0
    assert para_row["f_dup_para"] == 1
    assert para_row["f_dup_para_char"] == 1
    # the five text rules stay clean even on the paragraph doc
    assert all(para_row[c] == 0 for c in all_fail_cols[:5])


def test_line_metrics_kernel_exact_on_newline_doc(spark):
    # Hand-computed metrics for one small doc, including the empty
    # line a '\n\n' leaves behind under line splitting and the
    # multi-line paragraphs under paragraph splitting.
    from bq_nvd_spark.plans.curation import (
        line_metrics_kernel,
        newline_segment_cols,
    )

    text = "aa bb\ncc\naa bb\n\naa bb\ncc"
    df = spark.createDataFrame(
        [(1, text, "s")], "doc_id long, text string, source string"
    )
    [m] = line_metrics_kernel(df, newline_segment_cols).collect()
    assert (m.n_lines, m.dup_lines, m.dup_line_chars, m.line_chars) == (
        6, 3, 12, 19,
    )
    assert (m.n_paras, m.dup_paras, m.dup_para_chars, m.para_chars) == (
        2, 0, 0, 22,  # 'aa bb\ncc\naa bb' (14) + 'aa bb\ncc' (8)
    )
    assert (m.bullet_lines, m.ellipsis_lines) == (0, 0)


def test_line_repetition_census_sums_profile(spark, sf_dir):
    # The per-source mass census is exactly the per-doc profile summed
    # — pins the census to the profile over the driver fixture.
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import _LINEM_NAMES

    prof = QUERIES["doc_line_repetition_profile"](spark, sf_dir).collect()
    census = QUERIES["line_repetition_census"](spark, sf_dir).collect()
    totals = {c: sum(r[c] for r in prof) for c in _LINEM_NAMES}
    census_totals = {
        c: sum(r[c] for r in census) for c in _LINEM_NAMES
    }
    assert census_totals == totals
    assert sum(r["n_docs"] for r in census) == len(prof)
    assert totals["dup_lines"] > 0  # fixture non-degeneracy


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


def test_snapshot_dup_delta_flags_reingested_content(spark, tmp_path):
    # Membership in prev/current is md5(doc_id)-bucketed, so pick doc
    # ids on each side of the split programmatically, then plant one
    # current doc whose text is byte-identical to a previous-snapshot
    # doc (identical MinHash signatures -> guaranteed band collision)
    # and one current doc with disjoint vocabulary. The census must
    # count exactly the replanted doc as a duplicate, per source.
    import hashlib

    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.sampling import TRAIN_END

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)

    prev_ids = [i for i in range(200) if bucket(i) < TRAIN_END][:2]
    cur_ids = [i for i in range(200) if bucket(i) >= TRAIN_END][:2]
    seen = "alpha beta gamma delta epsilon zeta eta theta"
    fresh = "iota kappa lam mu nu xi omicron pi"
    other = "rho sigma tau upsilon phi chi psi omega"
    rows = [
        (prev_ids[0], seen, "en", "src_resend", len(seen)),
        (prev_ids[1], other, "en", "src_fresh", len(other)),
        (cur_ids[0], seen, "en", "src_resend", len(seen)),  # re-ingested
        (cur_ids[1], fresh, "en", "src_fresh", len(fresh)),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    census = {
        r["source"]: (r["n_new_docs"], r["n_dup_docs"])
        for r in QUERIES["snapshot_dup_delta"](
            spark, str(tmp_path)
        ).collect()
    }
    assert census == {"src_resend": (1, 1), "src_fresh": (1, 0)}


def _fw_segments(text, w):
    toks = text.split(" ")
    return [
        " ".join(toks[i * w : (i + 1) * w])
        for i in range((len(toks) + w - 1) // w)
    ]


def test_boilerplate_census_and_excision_agree_with_python(spark, sf_dir):
    # Full Python cross-check on the driver fixture: recompute line
    # doc-frequencies with the same fixed-width segmentation, pin the
    # census set, then verify every excised doc is exactly its
    # non-boilerplate segments rejoined in order.
    from collections import defaultdict

    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import BP_MIN_DF, GQ_LINE_W

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    df_docs = defaultdict(set)
    occ = defaultdict(int)
    for did, text in docs.items():
        for seg in _fw_segments(text, GQ_LINE_W):
            df_docs[seg].add(did)
            occ[seg] += 1
    expect_bp = {l for l, d in df_docs.items() if len(d) >= BP_MIN_DF}
    census = {
        r["line"]: r
        for r in QUERIES["boilerplate_lines_census"](spark, sf_dir).collect()
    }
    assert set(census) == expect_bp
    for line, r in census.items():
        assert r["df_docs"] == len(df_docs[line])
        assert r["n_occ"] == occ[line] >= r["df_docs"]
        assert 1 <= r["n_sources"] <= r["df_docs"]
    got = {
        r["doc_id"]: r
        for r in QUERIES["boilerplate_excised_docs"](spark, sf_dir).collect()
    }
    assert set(got) == set(docs)
    n_touched = 0
    for did, text in docs.items():
        segs = _fw_segments(text, GQ_LINE_W)
        kept = [s for s in segs if s not in expect_bp]
        r = got[did]
        assert r["clean_text"] == " ".join(kept)
        assert r["n_lines_kept"] == len(kept)
        assert r["n_lines_cut"] == len(segs) - len(kept)
        if r["n_lines_cut"]:
            n_touched += 1
        else:
            assert r["clean_text"] == text  # untouched docs roundtrip
    assert 0 < n_touched < len(docs)  # fixture non-degeneracy


def test_quality_gate_agreement_marginals(spark, sf_dir):
    # The 2x2 matrix's marginals must equal the two gates' own
    # censuses exactly, and its cells must account for every doc.
    from bq_nvd_spark.plans import QUERIES

    agree = {
        r["source"]: r.asDict()
        for r in QUERIES["quality_gate_agreement"](spark, sf_dir).collect()
    }
    gop = {
        r["source"]: r.asDict()
        for r in QUERIES["gopher_quality_census"](spark, sf_dir).collect()
    }
    rep = {
        r["source"]: r.asDict()
        for r in QUERIES["repetition_filter_census"](spark, sf_dir).collect()
    }
    assert set(agree) == set(gop) == set(rep)
    cells = ["n_both_keep", "n_gopher_only", "n_rep_only", "n_both_drop"]
    for src, a in agree.items():
        assert sum(a[c] for c in cells) == gop[src]["n_docs"]
        assert a["n_both_keep"] + a["n_gopher_only"] == gop[src]["n_kept"]
        assert a["n_both_keep"] + a["n_rep_only"] == rep[src]["n_kept"]
    # the gates genuinely disagree somewhere on the fixture — the
    # matrix carries information beyond either census alone
    assert sum(
        a["n_gopher_only"] + a["n_rep_only"] for a in agree.values()
    ) > 0


def test_boilerplate_kernels_on_newline_corpus(spark):
    # The advertised real-corpus path: newline segmentation with '\n'
    # rejoin. A header line shared by BP_MIN_DF docs is identified and
    # excised; unique lines survive with their newline structure
    # intact (the rejoin separator is the segmentation's inverse).
    from bq_nvd_spark.plans.curation import (
        BP_MIN_DF,
        boilerplate_excise_kernel,
        boilerplate_lines_kernel,
        newline_segment_cols,
        pos_lines_kernel,
    )

    header = "SITE NAV home about contact"
    rows = [
        (i, header + f"\nunique body {i} alpha\nunique body {i} beta", "s")
        for i in range(BP_MIN_DF)
    ]
    rows.append((99, "standalone doc\nwith no header", "s"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    pos = pos_lines_kernel(docs, newline_segment_cols)
    bp = boilerplate_lines_kernel(pos)
    assert [(r.line, r.df_docs) for r in bp.collect()] == [
        (header, BP_MIN_DF)
    ]
    out = {
        r.doc_id: r
        for r in boilerplate_excise_kernel(pos, bp, sep="\n").collect()
    }
    for i in range(BP_MIN_DF):
        assert out[i].clean_text == (
            f"unique body {i} alpha\nunique body {i} beta"
        )
        assert (out[i].n_lines_kept, out[i].n_lines_cut) == (2, 1)
    assert out[99].clean_text == "standalone doc\nwith no header"
    assert (out[99].n_lines_kept, out[99].n_lines_cut) == (2, 0)


def test_bloom_decontamination_flags_planted_contamination(
    spark, sf_dir, tmp_path
):
    # Constructed corpus: an eval-split doc shares one exact DECON_N-
    # gram with one train doc (different overall texts, so exact-dup
    # rep collapsing cannot merge them); a second train doc shares
    # nothing. The census must count exactly the planted doc, with
    # both Bloom properties holding; the fixture pass then re-checks
    # the properties per source on real data (the exact counts
    # themselves are hash-gated by the oracle).
    import hashlib

    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.sampling import DECON_N, VAL_END

    assert DECON_N == 5

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)

    eval_ids = [i for i in range(400) if bucket(i) >= VAL_END][:1]
    train_ids = [i for i in range(400) if bucket(i) < VAL_END][:2]
    shared = "q1 q2 q3 q4 q5"
    pad = " ".join(f"pad{i}" for i in range(6))
    rows = [
        (eval_ids[0], shared + " evaltail " + pad, "en", "src_hit", 1),
        (train_ids[0], "trainhead " + shared, "en", "src_hit", 1),
        (train_ids[1], " ".join(f"clean{i}" for i in range(12)),
         "en", "src_clean", 1),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    census = {
        r["source"]: r.asDict()
        for r in QUERIES["bloom_decontamination_census"](
            spark, str(tmp_path)
        ).collect()
    }
    assert census["src_hit"]["n_train_docs"] == 1
    assert census["src_hit"]["n_flagged_exact"] == 1
    assert census["src_clean"]["n_flagged_exact"] == 0
    for row in census.values():
        assert row["no_false_negatives"] is True
        assert row["fp_within_bound"] is True

    from bq_nvd_spark.operators.checkpoint import release_shared_stages

    release_shared_stages(spark)
    fixture = QUERIES["bloom_decontamination_census"](
        spark, sf_dir
    ).collect()
    assert len(fixture) > 1
    assert all(
        r["no_false_negatives"] and r["fp_within_bound"] for r in fixture
    )


def test_bloom_bound_actually_trips_on_an_undersized_filter(spark):
    # The fp_within_bound boolean must be a real computation, not a
    # vacuous TRUE: with the position space shrunk to 8 "bits", 7
    # hashes per gram saturate the filter, every clean train gram
    # false-positives, and the census must report
    # no_false_negatives=True (the Bloom guarantee survives any
    # sizing) but fp_within_bound=False (excess 100% of train docs >
    # BLOOM_FP_PCT). The same corpus at production BLOOM_BITS passes
    # both — pinning that the flip is driven by the filter sizing.
    from bq_nvd_spark.plans.sampling import bloom_census_kernel

    rows = (
        [(i, "s", f"evalgram{i}", True) for i in range(10)]
        + [(100 + i, "s", f"cleangram{i}", False) for i in range(20)]
    )
    labeled = spark.createDataFrame(
        rows, "doc_id long, source string, gram string, held boolean"
    )
    [tiny] = bloom_census_kernel(labeled, bits=8).collect()
    assert tiny.n_train_docs == 20
    assert tiny.n_flagged_exact == 0
    assert tiny.no_false_negatives is True
    assert tiny.fp_within_bound is False  # the bound genuinely fires
    [prod] = bloom_census_kernel(labeled).collect()
    assert prod.n_flagged_exact == 0
    assert prod.no_false_negatives is True
    assert prod.fp_within_bound is True


def test_c4_rules_fire_individually(spark):
    # The round-17 C4 gate on the ADVERTISED real-corpus path: newline
    # segmentation + the paper's punctuation terminal set, one doc per
    # rule built to fail exactly it (plus one clean doc that passes).
    from bq_nvd_spark.plans.curation import (
        C4_PUNCT_TERMINALS,
        c4_rules_kernel,
        newline_segment_cols,
    )

    good_lines = [f"alpha beta gamma delta line {i}." for i in range(6)]
    good = "\n".join(good_lines)
    docs = [
        (0, good, "src_pass"),
        # every line lacks a terminal mark -> all dropped -> min-lines
        (1, "\n".join(l.rstrip(".") for l in good_lines), "src_term"),
        # every line ends in '.' but has < 3 words -> all dropped
        (2, "\n".join("aa bb." for _ in range(6)), "src_short"),
        # clean lines but the page carries placeholder text
        (3, good + "\nSee Lorem Ipsum dolor sit amet.", "src_lorem"),
        # clean lines but the page leaks code
        (4, good + "\nfunction f() { return 1; }", "src_brace"),
        # clean lines, just too few of them
        (5, "\n".join(good_lines[:5]), "src_floor"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    )
    rows = {
        r["doc_id"]: r
        for r in c4_rules_kernel(
            df, newline_segment_cols, C4_PUNCT_TERMINALS
        ).collect()
    }
    assert rows[0].keep == 1 and rows[0].kept_lines == 6
    assert (rows[0].bad_terminal, rows[0].bad_short) == (0, 0)
    assert rows[1].keep == 0 and rows[1].ok_min_lines == 0
    assert rows[1].bad_terminal == 6 and rows[1].kept_lines == 0
    assert rows[2].keep == 0 and rows[2].bad_short == 6
    assert rows[2].kept_lines == 0
    assert rows[3].keep == 0 and rows[3].ok_blocklist == 0
    # the lorem line itself ends in '.' with >= 3 words: still kept at
    # LINE level — C4's blocklist is a PAGE rule
    assert rows[3].kept_lines == 7 and rows[3].ok_min_lines == 1
    assert rows[4].keep == 0 and rows[4].ok_brace == 0
    assert rows[5].keep == 0 and rows[5].ok_min_lines == 0
    assert rows[5].kept_lines == 5
    assert (rows[5].ok_blocklist, rows[5].ok_brace) == (1, 1)


def test_c4_kept_docs_rebuild_on_newline_corpus(spark):
    # The transform half: dropped lines are excised in place, kept
    # lines keep their original order, failing pages vanish entirely.
    from bq_nvd_spark.plans.curation import (
        C4_PUNCT_TERMINALS,
        c4_kept_docs_kernel,
        c4_rules_kernel,
        newline_segment_cols,
    )

    keep_a = [f"first second third keeper {i}." for i in range(6)]
    noisy = [keep_a[0], "no terminal here", keep_a[1], "hi.", *keep_a[2:]]
    docs = [
        (0, "\n".join(noisy), "s"),
        (1, "too few lines to survive.", "s"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    )
    rules = c4_rules_kernel(df, newline_segment_cols, C4_PUNCT_TERMINALS)
    out = {r["doc_id"]: r for r in c4_kept_docs_kernel(rules, "\n").collect()}
    assert set(out) == {0}
    assert out[0].text_c4 == "\n".join(keep_a)
    assert out[0].kept_lines == 6


def test_c4_census_sums_profile(spark, sf_dir):
    # The per-source census is exactly the per-doc profile summed, and
    # the fixture binding splits non-degenerately (some pages kept,
    # some dropped) — the constant-tuning contract.
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import C4_METRIC_NAMES

    prof = QUERIES["doc_c4_quality_profile"](spark, sf_dir).collect()
    census = QUERIES["c4_quality_census"](spark, sf_dir).collect()
    for c in [*C4_METRIC_NAMES, "keep"]:
        want = sum(r[c] for r in prof)
        got = sum(r[c if c != "keep" else "n_kept"] for r in census)
        assert got == want, c
    kept = sum(r["keep"] for r in prof)
    assert 0 < kept < len(prof)
    # kept pages are exactly the transform's output rows
    assert QUERIES["c4_kept_docs"](spark, sf_dir).count() == kept


def test_streaming_c4_gate_equals_batch_census(spark, sf_dir):
    # Stateless projection into one aggregate: the streamed census
    # must equal the batch census field-for-field (the Gopher-gate
    # twin contract).
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import C4_METRIC_NAMES, C4_RULE_NAMES

    cols = (
        ["n_docs", "n_kept"]
        + list(C4_METRIC_NAMES)
        + [f"f_{n[3:]}" for n in C4_RULE_NAMES]
    )
    batch = {
        r["source"]: tuple(r[c] for c in cols)
        for r in QUERIES["c4_quality_census"](spark, sf_dir).collect()
    }
    streamed = {
        r["source"]: tuple(r[c] for c in cols)
        for r in QUERIES["streaming_c4_gate"](spark, sf_dir).collect()
    }
    assert streamed == batch


def test_bloom_fast_path_flagged_superset_under_undersized_filter(spark):
    # The production transform's safety property: flagged ⊇ exactly-
    # contaminated at ANY sizing (no false negatives), so survivors
    # can never retain a contaminated doc; an undersized filter
    # over-flags (strict superset — the false-positive case the
    # registered query's zero-FP equality argument rests on being
    # driven somewhere), never under-flags.
    from bq_nvd_spark.plans.sampling import bloom_flagged_ids

    rows = (
        [(i, "s", f"evalgram{i}", True) for i in range(10)]
        # doc 100 is genuinely contaminated: it carries an eval gram
        + [(100, "s", "evalgram0", False)]
        + [(100 + i, "s", f"cleangram{i}", False) for i in range(20)]
    )
    labeled = spark.createDataFrame(
        rows, "doc_id long, source string, gram string, held boolean"
    )
    exact_contaminated = {100}
    train_ids = {100 + i for i in range(20)}
    tiny = {r.doc_id for r in bloom_flagged_ids(labeled, bits=8).collect()}
    prod = {r.doc_id for r in bloom_flagged_ids(labeled).collect()}
    assert exact_contaminated <= tiny <= train_ids
    assert len(tiny) > 1  # the undersized filter really over-flags
    assert prod == exact_contaminated  # production sizing: zero FPs
    # survivors = train − flagged: monotone in the flagged set, so
    # tiny-filter survivors ⊆ production survivors ⊆ exact survivors
    assert (train_ids - tiny) <= (train_ids - prod)
    assert 100 not in (train_ids - tiny) and 100 not in (train_ids - prod)


def test_ffd_packing_invariants(spark, sf_dir):
    # The FFD contract over the driver fixture: no bin exceeds its
    # capacity, bin ids are contiguous from 1 per source, the census's
    # waste column is the exact identity capacity*bins - tokens, and
    # FFD never uses fewer bins than the fractional lower bound (nor
    # more than the docs).
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.sampling import PACK_BUDGET

    assigned = QUERIES["ffd_packed_docs"](spark, sf_dir).collect()
    fills: dict = {}
    for r in assigned:
        key = (r.source, r.bin_idx)
        fills[key] = fills.get(key, 0) + r.n_tokens
    assert all(v <= PACK_BUDGET for v in fills.values())
    by_src: dict = {}
    for src, b in fills:
        by_src.setdefault(src, set()).add(b)
    assert all(bins == set(range(1, len(bins) + 1)) for bins in by_src.values())
    census = {r.source: r for r in QUERIES["ffd_packing_census"](spark, sf_dir).collect()}
    for src, r in census.items():
        assert r.n_bins == len(by_src[src])
        assert r.waste_tokens == r.n_bins * PACK_BUDGET - r.total_tokens
        assert r.baseline_bins <= r.n_bins <= r.n_docs
        # FFD can't beat the fractional bound
        assert r.n_bins * PACK_BUDGET >= r.total_tokens


def test_bloom_fast_path_zero_fp_at_every_fixture_sf(spark):
    # The registered transform's oracle is the EXACT survivor set, so
    # its hash equality rests on the production-sized filter yielding
    # zero false positives on the fixture corpus — a deterministic
    # fact for fixed data + xxhash64, pinned HERE at every SF so a
    # fixture regeneration or a BLOOM_BITS/BLOOM_K retune that
    # introduces an FP fails this test loudly instead of surfacing as
    # an opaque driver row diff.
    import os

    from pyspark.sql import functions as F

    from bq_nvd_spark.plans.sampling import (
        _decon_labeled,
        bloom_flagged_ids,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        labeled = _decon_labeled(spark, sf_dir)
        ev = labeled.filter("held").select("gram").distinct()
        exact = (
            labeled.filter(~F.col("held"))
            .join(ev, "gram", "left_semi")
            .select("doc_id")
            .distinct()
            .count()
        )
        flagged = bloom_flagged_ids(labeled).count()
        assert flagged == exact, (sf, flagged, exact)


def test_curation_funnel_is_monotone_and_pins_to_gates(spark, sf_dir):
    # Sequential attrition: each stage's survivor count is bounded by
    # the previous stage's, the first column is the per-gate C4 keep
    # count, and the funnel actually narrows somewhere on the fixture.
    from bq_nvd_spark.plans import QUERIES

    funnel = {
        r.source: r
        for r in QUERIES["curation_funnel_census"](spark, sf_dir).collect()
    }
    for r in funnel.values():
        assert (
            r.n_docs >= r.n_after_c4 >= r.n_after_gopher >= r.n_survivors
        )
    c4 = {
        r.source: r.n_kept
        for r in QUERIES["c4_quality_census"](spark, sf_dir).collect()
    }
    assert {s: r.n_after_c4 for s, r in funnel.items()} == c4
    assert sum(r.n_after_c4 for r in funnel.values()) > sum(
        r.n_after_gopher for r in funnel.values()
    ) or sum(r.n_docs for r in funnel.values()) > sum(
        r.n_after_c4 for r in funnel.values()
    )


def test_zipf_rank_census_matches_python_reference(spark, sf_dir):
    # Bucket arithmetic pinned to a Counter reference: every token
    # occurrence lands in exactly one bucket, bucket spans tile
    # [1, V] in powers of two, and the envelope is exact.
    import math
    from collections import Counter

    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.sources.tables import load_table

    cnt = Counter()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        cnt.update(r.text.split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    ref: dict = {}
    for i, (_, n) in enumerate(ranked, start=1):
        b = i.bit_length() - 1
        lo, hi, nt, occ, mx, mn = ref.get(
            b, (i, i, 0, 0, n, n)
        )
        ref[b] = (min(lo, i), max(hi, i), nt + 1, occ + n, max(mx, n), min(mn, n))
    got = {
        r.rank_bucket: (
            r.rank_lo, r.rank_hi, r.n_types, r.n_occ, r.max_freq, r.min_freq
        )
        for r in QUERIES["zipf_rank_census"](spark, sf_dir).collect()
    }
    assert got == ref
    assert sum(v[3] for v in got.values()) == sum(cnt.values())
    assert len(got) == math.floor(math.log2(len(cnt))) + 1


def test_streaming_c4_kept_docs_equals_batch_transform(spark, sf_dir):
    # Row-local decisions make the transform stateless: the streamed
    # append-mode output must equal the batch transform row-for-row.
    from bq_nvd_spark.plans import QUERIES

    key = lambda r: (r.doc_id, r.source, r.text_c4, r.kept_lines)  # noqa: E731
    batch = sorted(
        map(key, QUERIES["c4_kept_docs"](spark, sf_dir).collect())
    )
    streamed = sorted(
        map(key, QUERIES["streaming_c4_kept_docs"](spark, sf_dir).collect())
    )
    assert streamed == batch


def test_gate_agreement_cube_marginalizes_to_funnel_and_matrix(spark, sf_dir):
    # The cube's marginals must reproduce both coarser artifacts: the
    # sequential funnel columns and the pairwise 2x2 matrix cells.
    from bq_nvd_spark.plans import QUERIES

    cube = QUERIES["gate_agreement_cube"](spark, sf_dir).collect()
    funnel = {
        r.source: r
        for r in QUERIES["curation_funnel_census"](spark, sf_dir).collect()
    }
    matrix = {
        r.source: r
        for r in QUERIES["quality_gate_agreement"](spark, sf_dir).collect()
    }

    def msum(src, pred):
        return sum(r.n_docs for r in cube if r.source == src and pred(r))

    for src, f in funnel.items():
        assert msum(src, lambda r: True) == f.n_docs
        assert msum(src, lambda r: r.c4_keep == 1) == f.n_after_c4
        assert (
            msum(src, lambda r: r.c4_keep == 1 and r.g_keep == 1)
            == f.n_after_gopher
        )
        assert (
            msum(
                src,
                lambda r: r.c4_keep == 1 and r.g_keep == 1 and r.r_keep == 1,
            )
            == f.n_survivors
        )
    for src, m in matrix.items():
        assert msum(src, lambda r: r.g_keep == 1 and r.r_keep == 1) == m.n_both_keep
        assert msum(src, lambda r: r.g_keep == 0 and r.r_keep == 0) == m.n_both_drop


def test_cross_source_matrix_matches_itertools_reference(spark, tmp_path):
    # The round-17 one-exchange rewrite (per-gram source-set aggregate +
    # pair generation from the sorted set) must produce exactly the
    # rows of the specification: pairwise shared capped-gram counts and
    # the floor-fixed containment against the smaller side. Reference
    # computed independently with set algebra + itertools over a
    # constructed corpus that exercises a three-way overlap, a
    # no-overlap source, and a boilerplate gram past the doc-frequency
    # cap (which must not contribute anywhere).
    import itertools

    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.curation import GRAM_N, MATRIX_GRAM_DOC_CAP

    rows = [
        (1, "w1 w2 w3 w4 w5 w6", "en", "srcA", 1),
        (2, "w1 w2 w3 w4 w5 xx", "en", "srcB", 1),
        (3, "zz w2 w3 w4 w5 w6", "en", "srcC", 1),
        (4, "only unique tokens live here now", "en", "srcD", 1),
        (5, "too short", "en", "srcD", 1),
    ]
    # one gram shared by CAP+1 docs across srcA/srcB: over the cap,
    # must be dropped from counts and containment denominators alike
    for i in range(MATRIX_GRAM_DOC_CAP + 1):
        rows.append(
            (
                100 + i,
                f"b1 b2 b3 b4 b5 pad{i}",
                "en",
                "srcA" if i % 2 == 0 else "srcB",
                1,
            )
        )
    # a gram in exactly CAP DISTINCT docs, one of them ingested twice:
    # the cap must count distinct documents (the oracle's
    # COUNT(DISTINCT doc_id)), not rows — a row-count census would read
    # CAP+1 and wrongly drop it
    for i in range(MATRIX_GRAM_DOC_CAP):
        rows.append(
            (
                500 + i,
                f"c1 c2 c3 c4 c5 cpad{i}",
                "en",
                "srcC" if i % 2 == 0 else "srcD",
                1,
            )
        )
    rows.append(rows[-1])

    gram_docs: dict[str, set] = {}
    gram_srcs: dict[str, set] = {}
    for doc_id, text, _lang, src, _n in rows:
        ts = text.split(" ")
        grams = {
            " ".join(ts[i : i + GRAM_N])
            for i in range(len(ts) - GRAM_N + 1)
        }
        for g in grams:
            gram_docs.setdefault(g, set()).add(doc_id)
            gram_srcs.setdefault(g, set()).add(src)
    capped = [
        g for g, d in gram_docs.items() if len(d) <= MATRIX_GRAM_DOC_CAP
    ]
    assert any(len(gram_docs[g]) > MATRIX_GRAM_DOC_CAP for g in gram_docs)
    per_src: Counter = Counter()
    pair_n: Counter = Counter()
    for g in capped:
        for s in gram_srcs[g]:
            per_src[s] += 1
        for a, b in itertools.combinations(sorted(gram_srcs[g]), 2):
            pair_n[(a, b)] += 1
    expected = {
        (a, b): (
            n,
            math.floor(n / min(per_src[a], per_src[b]) * 10000 + 0.5)
            / 10000,
        )
        for (a, b), n in pair_n.items()
    }
    assert expected, "constructed corpus must produce overlap pairs"

    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        (r.source_a, r.source_b): (r.n_shared, r.containment)
        for r in QUERIES["cross_source_contamination_matrix"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expected
