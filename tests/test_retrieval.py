"""Lexical retrieval family (plans/llm.py E4g2-E4g4): BM25 single- and
multi-query, and RRF hybrid fusion. Value correctness is oracle-gated
(test_oracle_parity + the driver); these tests pin the SEMANTIC and
PLAN-SHAPE contracts the oracle comparison can't see."""

from __future__ import annotations

import contextlib
import io

from bq_nvd_spark.plans.llm import (
    BM25_MQ_TOPK,
    BM25_QUERY_SET,
    RRF_K,
    RRF_POOL,
    RRF_TOPK,
    bm25_multi_query_topk,
    bm25_topk_docs,
    rrf_fusion_topk,
)


def _final_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # AQE prints the initial plan too; everything before it is final
    return buf.getvalue().split("== Initial Plan ==")[0]


def test_bm25_only_consumer_prunes_vsm_column(spark, sf_dir):
    """The shared kernel computes BOTH ranker contributions in one
    projection; a BM25-only consumer must get micro_vsm pruned by
    Catalyst — the 'pay nothing for the extra column' claim in
    _bm25_contrib's docstring, which is what makes sharing the kernel
    free for the single-ranker queries."""
    plan = _final_plan(bm25_topk_docs(spark, sf_dir))
    assert "micro_vsm" not in plan
    # and the fusion consumer genuinely computes it
    assert "micro_vsm" in _final_plan(rrf_fusion_topk(spark, sf_dir))


def test_multi_query_ranks_are_contiguous_per_query(spark, sf_dir):
    rows = bm25_multi_query_topk(spark, sf_dir).collect()
    by_q: dict[str, list[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert set(by_q) == {qid for qid, _ in BM25_QUERY_SET}
    for qid, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), qid
        assert len(rnks) <= BM25_MQ_TOPK


def test_rrf_scores_are_exact_reciprocal_rank_sums(spark, sf_dir):
    """Every fused score must be expressible as the sum of one or two
    exact 10^9 div (K + r) contributions with r ≤ RRF_POOL — the
    integer-exact contract that makes the fusion hash-checkable."""
    valid_single = {10**9 // (RRF_K + r) for r in range(1, RRF_POOL + 1)}
    valid = valid_single | {
        a + b for a in valid_single for b in valid_single
    }
    rows = rrf_fusion_topk(spark, sf_dir).collect()
    assert rows, "fusion returned nothing at test SF"
    for r in rows:
        assert r["rrf_micro"] in valid, (r["doc_id"], r["rrf_micro"])
        assert 1 <= r["rnk"] <= RRF_TOPK


def test_rrf_consensus_outranks_single_ranker(spark, sf_dir):
    """A doc ranked by BOTH rankers must outrank a doc that only one
    ranker surfaced at the same single-ranker position — the reason a
    curation stack fuses at all. Verified structurally: the top fused
    doc's score exceeds the maximum any single-ranker-only doc can
    reach (10^9 div (K+1))."""
    rows = rrf_fusion_topk(spark, sf_dir).collect()
    best_single_only = 10**9 // (RRF_K + 1)
    top_by_q: dict[str, int] = {}
    for r in rows:
        if r["rnk"] == 1:
            top_by_q[r["query_id"]] = r["rrf_micro"]
    # with overlapping rankers on this corpus every query's winner is a
    # consensus doc; if this ever flips the fixture changed, not the op
    for qid, score in top_by_q.items():
        assert score > best_single_only, (qid, score)


def test_bm25_mq_contrib_memo_matches_bypass(spark, sf_dir):
    # The round-17 shared contrib relation must leave both consumers'
    # outputs bit-identical to the unshared pipeline: the memo changes
    # when the postings kernel runs, never its rows.
    from bq_nvd_spark.operators import checkpoint as cp

    def rowsets():
        mq = {
            tuple(r)
            for r in bm25_multi_query_topk(spark, sf_dir).collect()
        }
        rrf = {tuple(r) for r in rrf_fusion_topk(spark, sf_dir).collect()}
        return mq, rrf

    cp.release_shared_stages(spark)
    try:
        memo_mq, memo_rrf = rowsets()
        flag = cp.AUDIT_BYPASS_SHARED
        cp.AUDIT_BYPASS_SHARED = True
        try:
            direct_mq, direct_rrf = rowsets()
        finally:
            cp.AUDIT_BYPASS_SHARED = flag
        assert memo_mq and memo_mq == direct_mq
        assert memo_rrf and memo_rrf == direct_rrf
    finally:
        cp.release_shared_stages(spark)
