"""Query plans: the engine's user-facing query surface.

Importing this package populates the registry (``QUERIES`` / ``ORACLES``)
with every declared operator from SURVEY.md §2.
"""

from bq_nvd_spark.plans.registry import ORACLES, QUERIES

# The external correctness driver verifies the FIRST 50 registered queries
# (registration order == dict insertion order).  Round-10 rotation: the 4
# names whose only driver evidence dated to r4 lead (lang_distribution,
# token_counts_top20, bag_except_order_dates, first_event_per_user_type —
# the last of the old-evidence backlog), then every query round 10
# changed: the capped embedding LSH pair path and its dedup consumer,
# the RFM NULL-parity oracle, the two upsert-store queries (vacuum
# hysteresis now opt-in at the call sites), value_mad_outliers (shares
# the rank-selector guards), and the 21 queries whose data-proportional
# broadcast hints were removed (plans must stay green AND fast without
# the hints), then the 19 alphabetically-first names whose latest
# evidence is r5. After this round no query's latest driver row is
# older than r5; the r11 window owes the remaining 20 r5-era names plus
# mixture_resample_docs (added late in round 10 — never driver-checked;
# mirrored green at sf0.001/0.01/0.1 and invariant-tested locally).
_DRIVER_PRIORITY = [
    # -- last driver row r4 (oldest evidence in the registry) --
    "lang_distribution",
    "token_counts_top20",
    "bag_except_order_dates",
    "first_event_per_user_type",
    # -- changed in round 10 --
    "embedding_similar_pairs",
    "semantic_dedup_survivors",
    "customer_rfm_segments",
    "value_mad_outliers",
    "streaming_upsert_user_totals",
    "streaming_cdc_user_totals",
    # -- broadcast hints removed in round 10 --
    "nvd_first_write_wins",
    "monthly_urgent_gapfill",
    "streaming_static_enrich",
    "orders_per_region",
    "pivot_priority_by_segment",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_item_revenue",
    "q11_important_parts",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_part_census",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_banded_brand_revenue",
    "q20_excess_volume_suppliers",
    "q21_waiting_suppliers",
    # -- last driver row r5 (oldest remaining evidence) --
    "approx_distinct_users",
    "argmax_latest_event_per_user",
    "arrow_byte_stats",
    "arrow_group_quality",
    "bpe_merge_census",
    "duplicate_span_docs",
    "embedding_int8_census",
    "full_outer_daily_activity",
    "funnel_conversion",
    "grouping_sets_status_priority",
    "hll_daily_rollup",
    "kll_rank_accuracy",
    "lateral_top2_orders",
    "moment_stats_by_type",
    "orders_trailing_90d_revenue",
    "profile_orders_columns",
    "q13_customer_order_distribution",
    "q4_late_order_priorities",
    "recursive_month_spine",
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
