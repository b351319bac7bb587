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
    # -- round 16 window (VERDICT r15 task 1, exactly the rotation
    # pre-computed at r15 close): the 12 never-driver-checked r15
    # additions + the 38 alphabetically-first r12-era names = 50
    # exactly. The two logged r15 evictions
    # (approx_distinct_users, bpe_encode_top_tokens) are
    # alphabetically early in the r12 tier and so lead it
    # automatically, closing their deferral.
    # Post-r15 evidence distribution (from CORRECTNESS_r01-r15,
    # recomputed at r16 open): 12 never-checked + 47 @r12 + 50 @r13
    # + 49 @r14 + 50 @r15.
    # Deferral note: the 9 r12-era names after the alphabetical
    # first 38 defer to r17 with evidence age 4 rounds —
    # sketch_distinct_accuracy, streaming_approx_daily_users,
    # textrank_keywords, theta_overlap_users,
    # token_length_histogram, topk_orders_by_price,
    # vocab_growth_curve, window_running_order_total,
    # window_top3_customers_per_nation. They are the oldest backlog
    # and MUST lead the r17 window (all unchanged).
    # Code changed in r16, already inside the window (per the
    # standing code-change-outranks-backlog rule): the Gopher
    # composite trio (doc_gopher_quality_profile,
    # gopher_quality_census, streaming_gopher_gate) — rule 4's
    # alphabetic-word regex widened [a-z] -> [A-Za-z] (ADVICE r15)
    # and the kernel extended with the Gopher A1.1 line-granularity
    # repetition + format rules (VERDICT r15 task 3); all three
    # re-mirrored x3 SFs post-change and sit in the never-checked
    # tier below.
    # Added in round 16 BEYOND the window, owed to the r17 window as
    # never-driver-checked (each mirror-green x3 SFs on add):
    # doc_line_repetition_profile + line_repetition_census (the
    # line/paragraph-granularity duplicate-fraction profile behind
    # the new Gopher rules, E4 in plans/curation.py);
    # semdedup_pairs + semdedup_survivors (embedding-space semantic
    # near-dedup over the shared IVF quantizer -> connected
    # components -> min-id survivors, E2xE3 in
    # plans/similarity_search.py, VERDICT r15 task 4);
    # tokenizer_fertility_census (per-language chars/tokens under
    # the learned BPE merge table, integer-exact, E4 in
    # plans/llm.py, VERDICT r15 task 5);
    # snapshot_dup_delta (cross-snapshot per-source duplicate-rate
    # census, E2xE6 in plans/curation.py, VERDICT r15 task 7);
    # boilerplate_lines_census + boilerplate_excised_docs (CCNet-style
    # corpus-wide df-thresholded boilerplate line census and the
    # in-order removal transform, E2/E4 in plans/curation.py);
    # ivf_cell_census (per-cell population of the shared IVF
    # quantizer — the index-balance row behind every within-cell cost
    # argument, E3 in plans/similarity_search.py);
    # quality_gate_agreement (per-source 2x2 contingency between the
    # Gopher composite and the repetition gate — the filter-ensemble
    # design artifact, E4/E6 in plans/curation.py);
    # bloom_decontamination_census (Bloom membership pre-filter for
    # eval-set decontamination under the sketch family's accuracy-
    # bound oracle contract — relational set-bit-position filter,
    # constant-bounded state, E6xE7 in plans/sampling.py).
    # Code changed in r16, already inside the window:
    # decontamination_overlaps — its gram build extracted into the
    # shared_stage'd _decon_gram_rel (shared with the bloom census);
    # re-mirrored x3 SFs post-refactor.
    # Post-r16 evidence distribution (if this window runs green):
    # 11 never-checked (the r16 additions) + 9 @r12 (the logged
    # deferrals) + 50 @r13 + 49 @r14 + 50 @r15 + 50 @r16.
    # r17 rotation plan (computed at r16 close): the 11 r16 additions
    # + the 9 r12-era deferrals + the 30 alphabetically-first
    # r13-era names = 50 exactly; any r17 code change outranks
    # backlog per the standing rule. After that window no name's
    # evidence is older than r14 except the 20 r13-era deferrals
    # (flag for r18 priority).
    # -- never driver-checked (r15 additions, each mirror-green x3
    #    SFs; the Gopher trio also r16-code-changed, re-mirrored) --
    "doc_gopher_quality_profile",
    "gopher_quality_census",
    "streaming_gopher_gate",
    "dsir_importance_weights",
    "dsir_resample_topk",
    "temperature_mixture_quotas",
    "source_drift_kl",
    "mmr_ann_diverse_topk",
    "hard_negative_mining",
    "winnow_fingerprint_census",
    "winnow_shared_pairs",
    "span_excised_docs",
    # -- last driver row r12 (alphabetically first 38; leads with
    #    the two logged r15 evictions) --
    "approx_distinct_users",
    "bpe_encode_top_tokens",
    "bpe_train_merges",
    "chunk_documents_sliding",
    "count_nested_field",
    "cube_status_priority_census",
    "decontamination_overlaps",
    "dedup_clusters",
    "distinct_market_segments",
    "doubly_nested_exists",
    "embedding_similar_pairs",
    "exact_dedup_docs",
    "explode_unnest_roundtrip",
    "gap_fill_daily_counts",
    "group_agg_order_stats",
    "hll_daily_rollup",
    "hof_filter_transform_fold",
    "ivf_refined_topk",
    "jaccard_verified_pairs",
    "kmeans_lloyd_clusters",
    "like_filter_parts",
    "minhash_pairs_capped",
    "nested_exists_returned_items",
    "nested_projection_dotted_path",
    "nvd_count_cves",
    "nvd_cpe_product_counts",
    "nvd_severity_summary",
    "pq_adc_recall_topk",
    "q12_priority_buckets",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "quality_filtered_docs",
    "quantized_cosine_topk",
    "salted_join_event_weights",
    "semi_join_customers_with_urgent_orders",
    "set_except_custkeys",
    "set_intersect_custkeys",
    "set_union_keys",
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
