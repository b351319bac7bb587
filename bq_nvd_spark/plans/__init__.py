"""Query plans: the engine's user-facing query surface.

Importing this package populates the registry (``QUERIES`` / ``ORACLES``)
with every declared operator from SURVEY.md §2.
"""

from bq_nvd_spark.plans.registry import ORACLES, QUERIES

# The external correctness driver verifies the FIRST 50 registered queries
# (registration order == dict insertion order). Rotation rule, learned
# over rounds 4-11: queries whose CODE changed this round lead (their
# old green rows describe code that no longer exists), then
# never-checked and re-oracled names, then the stalest backlog; only
# truly-unchanged names may defer to the next round.
_DRIVER_PRIORITY = [
    # -- round 14 window (VERDICT r13 task 1, exactly the rotation
    # pre-computed at r13 close): the 7 never-driver-checked r13
    # additions + 43 of the 44 r10-era backlog names = 50 exactly.
    # Post-r13 evidence distribution (from CORRECTNESS_r01-r13):
    # 7 never-checked + 44 @r10 + 38 @r11 + 50 @r12 + 50 @r13.
    # Deferral note (the one r10-era name without a slot):
    # orders_per_region — plain groupBy/agg, code unchanged since its
    # r10 driver row (CORRECTNESS_r10.json, green); carries r10
    # evidence into r15, where it leads the backlog tier.
    # Code changed in r14, already inside the window (per the standing
    # code-change-outranks-backlog rule): the NB trio
    # (nb_lang_confusion, nb_confidence_filter, nb_kfold_accuracy) —
    # vocabulary capped at top-V by document frequency so the
    # vocab×classes likelihood broadcast is limit-bounded (VERDICT r13
    # task 2), identical cap in the oracles; each mirror-green ×3 SFs
    # post-change.
    # After this window, no name's evidence is older than r11 except
    # the logged deferral above.
    # Added in round 14 BEYOND the window, owed to the r15 window as
    # never-driver-checked (each mirror-green ×3 SFs on add):
    # doc_repetition_profile + repetition_filter_census (Gopher-family
    # duplicate-bigram fraction diagnostic and its exact-rational
    # kept/dropped gate, plans/curation.py);
    # lm_doc_perplexity + lm_ppl_bucket_census (CCNet-style bigram-LM
    # perplexity scoring and head/middle/tail census, E11d in
    # plans/classify.py);
    # mmr_diverse_topk (greedy MMR diversified retrieval over the
    # cosine pool, exact-integer trace via grouped applyInPandas, E3
    # in plans/similarity_search.py);
    # lm_ppl_tercile_cutoffs (exact avg-NLL terciles over the held
    # corpus via rank_select — how CCNet sets the bucket thresholds;
    # E11d in plans/classify.py);
    # streaming_repetition_gate (the repetition gate as an ingest
    # stream: stateless row-local HOF kernel + one complete-mode
    # census, T4 x E4/E6 in streaming/micro_batch.py).
    # r15 rotation plan (computed at r14 close from CORRECTNESS_r01-r13
    # + this window): post-r14 evidence distribution is 7 never-checked
    # (the additions above) + 1 @r10 (orders_per_region, the logged r14
    # deferral) + 38 @r11 + 50 @r12 + 50 @r13 + 50 @r14. The r15
    # window = 7 never + orders_per_region + all 38 r11-era names + the
    # 4 alphabetically-first r12-era names (agg_count_scalar,
    # anti_join_customers_without_orders, approx_distinct_users,
    # bpe_encode_top_tokens) = 50 exactly; the other 46 r12-era names
    # defer (all unchanged, evidence age then 3 rounds — within the
    # bar), and any query whose CODE changes in r15 outranks backlog
    # per the standing rule. After that window, no name's evidence is
    # older than r12.
    # -- never driver-checked (r13 additions, each mirror-green ×3 SFs) --
    "nb_lang_confusion",
    "nb_confidence_filter",
    "nb_kfold_accuracy",
    "pii_redaction_census",
    "streaming_pii_scrub",
    "rrf_fusion_topk",
    "cms_user_freq_accuracy",
    # -- last driver row r10 (stalest evidence in the registry) --
    "argmax_latest_event_per_user",
    "arrow_byte_stats",
    "arrow_group_quality",
    "bag_except_order_dates",
    "bpe_merge_census",
    "customer_rfm_segments",
    "duplicate_span_docs",
    "embedding_int8_census",
    "first_event_per_user_type",
    "full_outer_daily_activity",
    "funnel_conversion",
    "grouping_sets_status_priority",
    "kll_rank_accuracy",
    "lang_distribution",
    "lateral_top2_orders",
    "moment_stats_by_type",
    "monthly_urgent_gapfill",
    "nvd_first_write_wins",
    "orders_trailing_90d_revenue",
    "pivot_priority_by_segment",
    "profile_orders_columns",
    "q10_returned_item_revenue",
    "q11_important_parts",
    "q13_customer_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_part_census",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_banded_brand_revenue",
    "q20_excess_volume_suppliers",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q4_late_order_priorities",
    "q5_revenue_by_nation",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "recursive_month_spine",
    "streaming_static_enrich",
    "token_counts_top20",
    "value_mad_outliers",
]

def _reorder(registry: dict) -> None:
    head = {k: registry[k] for k in _DRIVER_PRIORITY if k in registry}
    tail = {k: v for k, v in registry.items() if k not in head}
    registry.clear()
    registry.update(head)
    registry.update(tail)


def finalize_registry() -> None:
    """Assert the driver window is intact, then put it first.

    A typo or a renamed query in _DRIVER_PRIORITY would otherwise be
    dropped silently by _reorder's ``if k in registry``, quietly
    shrinking the verified first-50 window. Checked against QUERIES
    only: ORACLES legitimately lacks the oracle=None entries.

    Called from the bottom of this module (the ``import plans`` path)
    AND from the bottom of ``bq_nvd_spark.streaming`` (the
    ``import streaming`` path): whichever package finishes registering
    LAST runs the reorder over the complete registry, so the window
    order no longer depends on which package a caller imports first —
    previously a streaming-first import reordered before the streaming
    queries existed, pushing them out of the first-50 window.
    Idempotent.
    """
    unknown = set(_DRIVER_PRIORITY) - QUERIES.keys()
    if unknown:  # a real raise, not assert: survives python -O
        raise ValueError(
            f"_DRIVER_PRIORITY names not in QUERIES: {sorted(unknown)}"
        )
    _reorder(QUERIES)
    _reorder(ORACLES)


# These imports populate QUERIES/ORACLES as a side effect; they sit
# BELOW the finalize_registry definition so the circular
# streaming -> micro_batch -> plans import can call it when streaming
# registration completes.
from bq_nvd_spark.plans import (  # noqa: E402,F401
    classify,
    clustering,
    curation,
    events,
    funnels,
    layout,
    llm,
    nested,
    nvd_ingest,
    pq,
    privacy,
    python_udfs,
    quantization,
    relational,
    sampling,
    similarity_search,
    sketches,
    skew_scale,
    spans,
    sql_surface,
    temporal_joins,
    warehouse,
)
from bq_nvd_spark import streaming  # noqa: E402,F401  (registers streaming queries)

if getattr(streaming, "_REGISTERED", False):
    # plans-first import: streaming finished above, registry complete.
    # (streaming-first import: streaming.__init__ is still mid-flight
    # here and calls finalize_registry itself once its last module
    # registers.)
    finalize_registry()

__all__ = ["QUERIES", "ORACLES", "finalize_registry"]
