"""Behavioral invariants for the theta/KLL sketch queries and span dedup.

Oracle parity pins exact cross-engine equality; these pin the semantic
claims: sketch error bounds actually hold (not vacuously true), span
counts are internally consistent, and the pairwise overlap relation is
canonically ordered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.plans.sketches import kll_rank_accuracy, theta_overlap_users
from bq_nvd_spark.plans.spans import (
    SPAN_N,
    duplicate_span_docs,
    span_contamination_census,
)
from bq_nvd_spark.sources.tables import load_table


def test_theta_overlap_bounds_hold_and_pairs_canonical(spark, sf_dir):
    rows = theta_overlap_users(spark, sf_dir).collect()
    assert rows, "fixture must produce overlapping event-type pairs"
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert len(rows) <= n_types * (n_types - 1) // 2
    for r in rows:
        assert r["et_a"] < r["et_b"]  # each unordered pair exactly once
        assert r["exact_overlap"] >= 1
        assert r["within_5pct"], (r["et_a"], r["et_b"])


def test_kll_rank_bound_holds_per_group(spark, sf_dir):
    rows = kll_rank_accuracy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rank_within_3pct"], r["event_type"]


def test_span_dedup_consistency(spark, sf_dir):
    per_doc = duplicate_span_docs(spark, sf_dir)
    census = span_contamination_census(spark, sf_dir).first()
    docs_total = load_table(spark, sf_dir, "documents").count()
    n_docs = per_doc.count()
    assert 0 < n_docs <= docs_total
    assert per_doc.filter(F.col("n_dup_spans") < 1).count() == 0
    # every duplicated occurrence belongs to some doc's count, exactly once
    total = per_doc.agg(F.sum("n_dup_spans")).first()[0]
    assert total == census["n_dup_occurrences"]
    assert census["n_dup_span_kinds"] >= 1
    assert census["max_docs_per_span"] >= 2
    # a span kind needs >= 2 occurrences to be duplicated
    assert census["n_dup_occurrences"] >= 2 * census["n_dup_span_kinds"]


def test_span_keys_skip_short_docs(spark, sf_dir):
    """Docs shorter than SPAN_N tokens contribute no spans (and no rows)."""
    docs = load_table(spark, sf_dir, "documents")
    short_ids = {
        r["doc_id"]
        for r in docs.filter(F.size(F.split("text", " ")) < SPAN_N).collect()
    }
    flagged = {r["doc_id"] for r in duplicate_span_docs(spark, sf_dir).collect()}
    assert not (short_ids & flagged)


def test_approx_distinct_users_all_null_day_matches_oracle(spark, tmp_path):
    """A day whose events all carry NULL user_id has exact_users = 0:
    the relative-error quotient would divide by zero, so the engine
    gates that case on the sketch agreeing the set is empty — and must
    still emit the oracle's literal TRUE. Hostile fixture: one normal
    day, one all-NULL day, one mixed day."""
    import datetime

    import duckdb

    from bq_nvd_spark.oracle_compare import rowset
    from bq_nvd_spark.plans import ORACLES, QUERIES

    # tz-AWARE instants: a naive datetime would be interpreted in the
    # process-local timezone at createDataFrame while to_date runs in
    # the session's pinned UTC, shifting rows across the day boundary
    # on hosts far from UTC and splitting the all-NULL day.
    utc = datetime.timezone.utc

    def d(*a):
        return datetime.datetime(*a, tzinfo=utc)

    rows = [
        (1, d(2024, 1, 1, 8), 10, "click", 1.0, "{}"),
        (2, d(2024, 1, 1, 9), 11, "click", 1.0, "{}"),
        (3, d(2024, 1, 2, 8), None, "click", 1.0, "{}"),
        (4, d(2024, 1, 2, 9), None, "view", 1.0, "{}"),
        (5, d(2024, 1, 3, 8), 12, "click", 1.0, "{}"),
        (6, d(2024, 1, 3, 9), None, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    sdf = QUERIES["approx_distinct_users"](spark, str(tmp_path))
    got = {r["day"]: (r["exact_users"], r["within_bound"]) for r in sdf.collect()}
    assert got[datetime.date(2024, 1, 2)] == (0, True), got

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    rel = con.sql(ORACLES["approx_distinct_users"])
    assert sorted(sdf.columns) == sorted(rel.columns)
    s_norm = rowset(sdf.columns, [tuple(r) for r in sdf.collect()])
    d_norm = rowset(rel.columns, rel.fetchall())
    assert s_norm == d_norm


def test_cms_flags_hold_and_selection_is_exact_topk(spark, sf_dir):
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.sketches import CMS_TOPK

    rows = QUERIES["cms_user_freq_accuracy"](spark, sf_dir).collect()
    assert all(r.overcount_ok for r in rows)  # CMS can never undercount
    assert all(r.within_bound for r in rows)
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id").distinct().count()
    )
    assert len(rows) == min(CMS_TOPK, n_users)
    # selection is the exact top-K with exact per-user counts — at SFs
    # where every user fits in K (sf0.001: 15 users) this degenerates
    # to "all users, right counts", which still pins selection AND the
    # exact side; at larger SFs the prefix comparison pins the ordering
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("user_id"))
        .collect()
    )
    expect = {r.user_id: r.c for r in exact[: len(rows)]}
    assert {r.user_id: r.exact_count for r in rows} == expect


def _winnow_reference(tokens, k, w):
    """Brute-force winnowing (Schleimer et al. fig. 5 semantics):
    rightmost minimum of each window of k-gram hashes."""
    import hashlib

    def h(gram):
        return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)

    m = len(tokens) - k + 1
    if m < 1:
        return set()
    hs = [h(" ".join(tokens[i : i + k])) for i in range(m)]
    n_wins = max(1, m - w + 1)
    fps = set()
    for j in range(n_wins):
        win = hs[j : j + w]
        best = min(range(len(win)), key=lambda i: (win[i], -i))
        fps.add((hs[j + best], j + best + 1))  # 1-based position
    return fps


def test_winnow_census_matches_bruteforce_and_density(spark, sf_dir, tmp_path):
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.spans import (
        WIN_K,
        WIN_W,
        _build_winnow_fingerprints,
    )

    # brute-force equality on a small constructed corpus, including a
    # doc with fewer k-grams than the window (single-window collapse)
    texts = [
        "a b c d e f g h i j k l",
        "x y z w v u t s r q",
        "a b c d",          # exactly one k-gram
        "p q r s t",        # two k-grams, one window
        "m m m m m m m m",  # all-identical hashes: rightmost-min ties
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        (r.doc_id, r.h, r.p)
        for r in _build_winnow_fingerprints(spark, str(tmp_path)).collect()
    }
    want = set()
    for i, t in enumerate(texts):
        for h, p in _winnow_reference(t.split(" "), WIN_K, WIN_W):
            want.add((i, h, p))
    assert got == want

    # fixture: density near the Schleimer bound 2/(w+1) and the
    # guarantee n_fingerprints <= n_windows
    census = QUERIES["winnow_fingerprint_census"](spark, sf_dir).collect()
    assert census
    total_fp = sum(r.n_fingerprints for r in census)
    total_kg = sum(r.n_kgrams for r in census)
    density = total_fp / total_kg
    assert 0.25 < density < 0.55  # expected 2/(w+1) = 0.4
    for r in census:
        assert 1 <= r.n_fingerprints <= r.n_windows


def test_winnow_shared_run_guarantee(spark, tmp_path):
    # The winnowing theorem: two docs sharing a verbatim run of
    # >= WIN_K + WIN_W - 1 tokens share at least one fingerprint, even
    # when the run sits at DIFFERENT offsets (the case fixed-stride
    # spans can miss). Surrounding tokens are disjoint across docs.
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.spans import WIN_K, WIN_W

    run = [f"shared{i}" for i in range(WIN_K + WIN_W - 1)]
    doc_a = ["aa%d" % i for i in range(7)] + run + ["ab%d" % i for i in range(5)]
    doc_b = ["ba%d" % i for i in range(3)] + run + ["bb%d" % i for i in range(9)]
    doc_c = [f"lone{i}" for i in range(20)]  # no shared run
    rows = [
        (0, " ".join(doc_a), "en", "s", 1),
        (1, " ".join(doc_b), "en", "s", 1),
        (2, " ".join(doc_c), "en", "s", 1),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in QUERIES["winnow_shared_pairs"](spark, str(tmp_path)).collect()
    }
    # WIN_SHARED_MIN = 2 would hide a single-fingerprint guarantee hit;
    # the run here is long enough to leave >= 2 shared minima in this
    # construction — and doc_c must pair with nobody
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(p == (0, 1) for p in pairs)


def test_span_excision_cuts_exactly_the_shared_run(spark, sf_dir, tmp_path):
    from bq_nvd_spark.plans import QUERIES
    from bq_nvd_spark.plans.spans import SPAN_N

    run = [f"dup{i}" for i in range(SPAN_N)]  # exactly one shared span
    a = [f"a{i}" for i in range(5)] + run + [f"z{i}" for i in range(4)]
    b = [f"b{i}" for i in range(2)] + run + [f"y{i}" for i in range(6)]
    c = [f"c{i}" for i in range(12)]
    rows = [
        (0, " ".join(a), "en", "s", 1),
        (1, " ".join(b), "en", "s", 1),
        (2, " ".join(c), "en", "s", 1),
        (3, " ".join(run), "en", "s", 1),  # the run IS the whole doc
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: r
        for r in QUERIES["span_excised_docs"](spark, str(tmp_path)).collect()
    }
    assert got[0].text_clean == " ".join(a[:5] + a[5 + SPAN_N:])
    assert got[0].n_removed == SPAN_N
    assert got[1].text_clean == " ".join(b[:2] + b[2 + SPAN_N:])
    assert got[2].text_clean == " ".join(c) and got[2].n_removed == 0
    # fully-excised doc still appears, empty
    assert got[3].text_clean == "" and got[3].n_removed == SPAN_N

    # fixture consistency: a doc loses tokens iff the span diagnostic
    # reports duplicated spans for it
    excised = {
        r.doc_id
        for r in QUERIES["span_excised_docs"](spark, sf_dir).collect()
        if r.n_removed > 0
    }
    flagged = {
        r.doc_id
        for r in QUERIES["duplicate_span_docs"](spark, sf_dir).collect()
    }
    assert excised == flagged
