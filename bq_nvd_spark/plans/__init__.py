"""Query plans: the engine's user-facing query surface.

Importing this package populates the registry (``QUERIES`` / ``ORACLES``)
with every declared operator from SURVEY.md §2.
"""

from bq_nvd_spark.plans import (  # noqa: F401
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
from bq_nvd_spark import streaming  # noqa: F401  (registers streaming queries)
from bq_nvd_spark.plans.registry import ORACLES, QUERIES

# The external correctness driver verifies the FIRST 50 registered queries
# (registration order == dict insertion order).  Round-6 rotation: the 14
# queries that have NEVER received a driver row across r01-r05 lead the
# window (closing the coverage gap — after this round the union of
# CORRECTNESS_r01-r06 covers all registered names), followed by every
# query whose physical plan changes this round (foreachBatch upsert sink
# rewrite, size-guarded survivor anti-joins, SCD2 tie-break), then
# previously-verified families on a rotating basis.
_DRIVER_PRIORITY = [
    # -- never driver-checked across r01-r05; MUST get a driver row now --
    "vocab_growth_curve",
    "incremental_dedup_new_docs",
    "tfidf_top_terms",
    "dedup_survivors",
    "stratified_sample_per_lang",
    "streaming_dedup_within_watermark",
    "label_centroids",
    "q7_volume_shipping",
    "q8_market_share",
    "q21_waiting_suppliers",
    "edit_distance_verified_pairs",
    "customer_balance_tiles",
    "cube_status_priority_census",
    "event_transition_matrix",
    # -- new in round 6 (first driver check) --
    "dedup_survivors_by_quality",
    "dedup_cluster_size_histogram",
    "oov_rate_by_vocab",
    "heavy_hitter_tokens",
    "streaming_cdc_user_totals",
    "streaming_approx_daily_users",
    "label_cohesion_stats",
    # -- plans touched by round-6 hardening (re-verify hashes) --
    "streaming_upsert_user_totals",
    "semantic_dedup_survivors",
    "scd2_event_type_intervals",
    "streaming_funnel_conversion",
    "stateful_user_totals",
    # -- r5 bench-regression set (re-verify alongside re-measurement) --
    "sequence_packing",
    "q3_top_revenue_orders",
    "q22_idle_rich_customers",
    "session_window_per_user",
    # -- rotating re-verification of older families --
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q10_returned_item_revenue",
    "q12_priority_buckets",
    "q14_promo_share",
    "q18_large_orders",
    "nvd_feed_ingest",
    "nvd_count_cves",
    "nvd_first_write_wins",
    "nvd_flagship_linux_cves",
    "nvd_cvss_vector_parse",
    "exact_dedup_docs",
    "minhash_lsh_buckets",
    "minhash_candidate_pairs",
    "jaccard_verified_pairs",
    "dedup_clusters",
    "simhash_near_dup_pairs",
    "cosine_topk",
    "ann_lsh_topk",
    "ivf_topk",
    "text_quality_stats",
    "lang_distribution",
    "token_counts_top20",
    "doc_rolling_fingerprint",
    "asof_last_error_per_click",
    "range_join_clicks_after_error",
    "window_top3_customers_per_nation",
    "orders_per_region",
    "topk_orders_by_price",
    "anti_join_customers_without_orders",
    "semi_join_customers_with_urgent_orders",
    "rollup_orders_by_month",
    "pivot_priority_by_segment",
    "explode_unnest_roundtrip",
    "json_extract_props",
    "hof_filter_transform_fold",
    "streaming_tumbling_counts",
    "streaming_dedup_keys",
    "streaming_sliding_counts",
    "streaming_session_counts",
    "streaming_click_error_join",
    "nested_exists_returned_items",
    "doubly_nested_exists",
    "like_filter_parts",
    "regex_normalize_parts",
    "agg_count_scalar",
    "count_nested_field",
]


def _reorder(registry: dict) -> None:
    head = {k: registry[k] for k in _DRIVER_PRIORITY if k in registry}
    tail = {k: v for k, v in registry.items() if k not in head}
    registry.clear()
    registry.update(head)
    registry.update(tail)


_reorder(QUERIES)
_reorder(ORACLES)

__all__ = ["QUERIES", "ORACLES"]
