"""Query plans: the engine's user-facing query surface.

Importing this package populates the registry (``QUERIES`` / ``ORACLES``)
with every declared operator from SURVEY.md §2.
"""

from bq_nvd_spark.plans.registry import ORACLES, QUERIES

# The external correctness driver verifies the FIRST 50 registered queries
# (registration order == dict insertion order).  Round-9 rotation: the 13
# names whose only driver evidence dated to r2 lead (two rounds overdue),
# then every query new or changed this round — the new exact global
# percentiles (first driver check), the two single-task-window
# rewrites (rank-select), the PMI broadcast-hint drop, the
# contamination-matrix rare-gram cap, and both upsert-store queries
# (vacuum hysteresis) — then 29 of the 33 names last checked in r4.
# The four r4 names left outside the window (`lang_distribution`,
# `token_counts_top20` — single-aggregate shapes whose code paths a
# dozen in-window queries share — `bag_except_order_dates`, whose
# EXCEPT ALL twin `bag_intersect_order_dates` is in-window, and
# `first_event_per_user_type`, whose partitioned-window-dedup path
# `window_top3_customers_per_nation` + `streaming_dedup_keys` cover)
# stay the OLDEST evidence in the registry at r4; every other query's
# latest driver row is r5+ after this round.
_DRIVER_PRIORITY = [
    # -- last driver row r2 (two rounds overdue) --
    "langid_ngram_pred",
    "bpe_token_stats",
    "lang_group_profile",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_resize_thumb",
    "nvd_version_bounds",
    "nvd_v2_v3_score_gap",
    "nvd_cwe_counts",
    "nvd_modification_lag",
    "nvd_reference_tag_counts",
    "nvd_av_severity_matrix",
    "nvd_assigner_stats",
    # -- new or changed in round 9 --
    "order_price_percentiles_exact",
    "doc_length_percentiles_by_lang",
    "customer_rfm_segments",
    "value_mad_outliers",
    "collocation_pmi_top",
    "cross_source_contamination_matrix",
    "streaming_upsert_user_totals",
    "streaming_cdc_user_totals",
    # -- last driver row r4 --
    "asof_last_error_per_click",
    "bag_intersect_order_dates",
    "deterministic_sample_docs",
    "doc_rolling_fingerprint",
    "embedding_similar_pairs",
    "json_extract_props",
    "minhash_pairs_capped",
    "multimodal_binary_meta",
    "ngram_jaccard_adjacent",
    "order_price_quantiles",
    "orders_above_customer_avg",
    "orders_mom_growth",
    "pivot_priority_by_segment",
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
    clustering,
    curation,
    events,
    funnels,
    layout,
    llm,
    nested,
    nvd_ingest,
    pq,
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
