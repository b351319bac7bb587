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
    # -- round 13 window (VERDICT r12 task 1): the 6 owed names + the
    # whole r9-era backlog in one rotation. 2 never-driver-checked
    # (bm25_topk_docs, added late in r12, mirror-green ×3 SFs; and
    # bm25_multi_query_topk, the r13 parameterized-retrieval add) +
    # 5 changed-execution-path (the chain consumers whose r11 rows
    # predate the r12 shared-stage rework: result-identical
    # projections/joins over memoized relations, each mirror-green
    # post-rework) + 43 r9-era backlog names = 50 exactly. After this
    # window, no name's latest driver evidence is older than r10.
    # Deferral note: NOTHING defers this round — the 44 r10-era, 43
    # r11-era and 50 r12-era names are all unchanged and inside the
    # age bar. (r12 header slip fixed per VERDICT: customer_rfm_segments
    # carries r10 evidence — CORRECTNESS_r10.json — not r9.)
    # Added in round 13 BEYOND the full window, owed to the r14 window
    # as never-driver-checked (each mirror-green ×3 SFs on add):
    # rrf_fusion_topk (RRF hybrid retrieval over BM25+VSM rankings),
    # nb_lang_confusion + nb_confidence_filter (Naive Bayes learned-
    # filter classifier: confusion matrix + margin-gated filter, E11),
    # nb_kfold_accuracy (one-pass complement-count k-fold CV, E11),
    # pii_redaction_census + streaming_pii_scrub (PII scrub census
    # and its scrub-on-ingest streaming twin, E12),
    # cms_user_freq_accuracy (Count-Min point-frequency sketch under
    # the accuracy-bound oracle contract).
    # r14 rotation plan (computed at r13 close from CORRECTNESS_r01-r12
    # + this window): post-r13 evidence distribution is 7 never-checked
    # (the additions above) + 44 @r10 + 38 @r11 + 50 @r12 + 50 @r13.
    # 7 never + 43 of the 44 r10-era names = 50 exactly; the one
    # deferred r10-era name (builder's choice, prefer one unchanged
    # since r10) must be logged here with its evidence round, and any
    # query whose CODE changes in r14 outranks backlog per the standing
    # rule.
    # Also changed in r13 but NOT in the window (no slot): hll_daily_rollup
    # — accuracy gate tightened 7%→5.6% (3.5σ at lgK=12, ADVICE r12);
    # expected-result-identical (all rows TRUE before and after),
    # mirror-green ×3 SFs post-change, carries r12 driver evidence.
    # -- never driver-checked --
    "bm25_topk_docs",
    "bm25_multi_query_topk",
    # -- execution path changed in round 12 (shared-stage consumers) --
    "edit_distance_verified_pairs",
    "dedup_survivors",
    "dedup_survivors_by_quality",
    "dedup_cluster_size_histogram",
    "semantic_dedup_survivors",
    # -- last driver row r9 (stalest evidence in the registry) --
    "asof_last_error_per_click",
    "bag_intersect_order_dates",
    "bpe_token_stats",
    "collocation_pmi_top",
    "cross_source_contamination_matrix",
    "deterministic_sample_docs",
    "doc_length_percentiles_by_lang",
    "doc_rolling_fingerprint",
    "json_extract_props",
    "lang_group_profile",
    "langid_ngram_pred",
    "multimodal_binary_meta",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_resize_thumb",
    "ngram_jaccard_adjacent",
    "nvd_assigner_stats",
    "nvd_av_severity_matrix",
    "nvd_cwe_counts",
    "nvd_modification_lag",
    "nvd_reference_tag_counts",
    "nvd_v2_v3_score_gap",
    "nvd_version_bounds",
    "order_price_percentiles_exact",
    "order_price_quantiles",
    "orders_above_customer_avg",
    "orders_mom_growth",
    "range_join_clicks_after_error",
    "regex_normalize_parts",
    "rollup_orders_by_month",
    "salted_distinct_users_per_type",
    "ship_delay_by_month",
    "simhash_signatures",
    "sliding_window_hourly_30m",
    "streaming_click_error_join",
    "streaming_dedup_keys",
    "streaming_session_counts",
    "streaming_sliding_counts",
    "streaming_tumbling_counts",
    "text_quality_stats",
    "train_val_test_split",
    "tumbling_window_hourly",
    "unpivot_lineitem_measures",
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
