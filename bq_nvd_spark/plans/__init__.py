"""Query plans: the engine's user-facing query surface.

Importing this package populates the registry (``QUERIES`` / ``ORACLES``)
with every declared operator from SURVEY.md §2.
"""

from bq_nvd_spark.plans.registry import ORACLES, QUERIES

# The external correctness driver verifies the FIRST 50 registered queries
# (registration order == dict insertion order).  Round-7 rotation: queries
# whose implementation or runtime changed this round lead (the
# stage_checkpoint lifecycle fix touches every checkpoint-using plan, the
# upsert-store retention/workdir changes touch both foreachBatch queries,
# and bpe_train_merges dropped its dead final-round rewrite), followed by
# the longest-unverified tail — every query whose latest driver row dates
# from r1, then the r2 cohort (13 r2 names remain for the r8 window:
# langid_ngram_pred, bpe_token_stats, lang_group_profile,
# multimodal_resize_thumb, nvd_version_bounds, multimodal_decode_features,
# multimodal_frame_sample, nvd_v2_v3_score_gap, nvd_cwe_counts,
# nvd_modification_lag, nvd_reference_tag_counts, nvd_av_severity_matrix,
# nvd_assigner_stats).
_DRIVER_PRIORITY = [
    # -- new in round 7 (first driver check) --
    "kmeans_lloyd_clusters",
    "bpe_encode_top_tokens",
    "chunk_documents_sliding",
    "textrank_keywords",
    "gap_fill_daily_counts",
    "value_mad_outliers",
    "collocation_pmi_top",
    "customer_rfm_segments",
    "cross_source_contamination_matrix",
    # -- round-7 changed: checkpoint-lifecycle users --
    "bpe_train_merges",
    "pq_adc_recall_topk",
    "ivf_refined_topk",
    "ivf_topk",
    "decontamination_overlaps",
    "jaccard_verified_pairs",
    "quantized_cosine_topk",
    "theta_overlap_users",
    "vocab_growth_curve",
    "q11_important_parts",
    "q15_top_supplier",
    "dedup_clusters",
    "dedup_survivors",
    "dedup_survivors_by_quality",
    "semantic_dedup_survivors",
    # -- round-7 changed: upsert-store retention / workdir --
    "streaming_upsert_user_totals",
    "streaming_cdc_user_totals",
    # -- round-7 measured under the skew fixture --
    "salted_join_event_weights",
    # -- last driver row r1 (most overdue) --
    "anti_join_customers_without_orders",
    "semi_join_customers_with_urgent_orders",
    "agg_count_scalar",
    "group_agg_order_stats",
    "like_filter_parts",
    "topk_orders_by_price",
    "distinct_market_segments",
    "window_top3_customers_per_nation",
    "window_running_order_total",
    "set_intersect_custkeys",
    "set_except_custkeys",
    "set_union_keys",
    "orders_per_region",
    # -- last driver row r2 --
    "nested_exists_returned_items",
    "doubly_nested_exists",
    "nested_projection_dotted_path",
    "count_nested_field",
    "explode_unnest_roundtrip",
    "hof_filter_transform_fold",
    "quality_filtered_docs",
    "token_length_histogram",
    "nvd_severity_summary",
    "nvd_cpe_product_counts",
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
