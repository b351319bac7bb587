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
    # -- round 15 window (VERDICT r14 task 1, exactly the rotation
    # pre-computed at r14 close): the 7 never-driver-checked r14
    # additions + orders_per_region (the logged r14 deferral, evidence
    # @r10) + all 38 r11-era names + the 4 alphabetically-first
    # r12-era names = 50 exactly.
    # Post-r14 evidence distribution (from CORRECTNESS_r01-r14):
    # 7 never-checked + 1 @r10 + 38 @r11 + 50 @r12 + 50 @r13 + 50 @r14.
    # Code changed in r15, already inside the window (per the standing
    # code-change-outranks-backlog rule): streaming_repetition_gate —
    # its per-row singleton-count kernel rewritten from the
    # O(distinct x len) nested HOF to array_sort + one adjacent-
    # inequality scan (O(L log L) per document, VERDICT r14 task 3);
    # mirror-green x3 SFs post-change.
    # Deferral note: the 46 r12-era names after the alphabetical
    # first 4 defer (all unchanged; evidence age 3 rounds — within
    # the bar). After this window, no name's evidence is older
    # than r12.
    # Added in round 15 BEYOND the window, owed to the r16 window as
    # never-driver-checked (each mirror-green x3 SFs on add):
    # dsir_importance_weights + dsir_resample_topk (DSIR targeted data
    # selection: hashed-n-gram importance log-weights in exact integer
    # micro-nats + deterministic Gumbel-top-K resample, E6+ in
    # plans/sampling.py, VERDICT r14 task 4);
    # mmr_ann_diverse_topk (MMR over the IVF shortlist — the shared
    # greedy kernel over ivf_topk's deterministic candidate set,
    # hash-exact, E3 in plans/similarity_search.py, VERDICT r14
    # task 5);
    # doc_gopher_quality_profile + gopher_quality_census (the full
    # Gopher five-rule quality composite, integer-exact in one scan,
    # E4/E6 in plans/curation.py, VERDICT r14 task 7);
    # streaming_gopher_gate (the same gate as an AvailableNow ingest
    # stream — stateless rules kernel + one complete-mode census,
    # oracle shared verbatim, T4 x E4/E6 in streaming/micro_batch.py);
    # temperature_mixture_quotas (mT5-style alpha-sampling quotas,
    # alpha=1/2 via IEEE-exact sqrt + the integer capacity/quota math,
    # E6+ in plans/sampling.py).
    # mmr_diverse_topk's code also changed in r15 (greedy
    # kernel extracted into _mmr_greedy_from_pool, trace unchanged) —
    # it is already inside this window per the code-change rule and
    # was re-mirrored x3 SFs post-refactor. ivf_topk's code changed
    # too (the IVF coarse quantizer extracted into
    # _ivf_assign_and_probes + _IVF_QUANTIZER_CTE, shared with
    # mmr_ann_diverse_topk; oracle byte-identical) — it takes the last
    # window slot, evicting bpe_encode_top_tokens (r12-era, unchanged,
    # deferral logged: leads the r16 backlog tier). The round-15
    # review's span-kernel sharing also changed duplicate_span_docs
    # (evidence @r14) — it takes the next slot, evicting
    # approx_distinct_users (r12-era, unchanged, defers to r16);
    # span_contamination_census and span_excised_docs share the same
    # kernels and are already in the window / the never-checked tier.
    # r16 rotation plan (computed at r15 close from CORRECTNESS_r01-r14
    # + this window): post-r15 evidence distribution is 12
    # never-checked (the r15 additions listed above +
    # winnow_fingerprint_census / winnow_shared_pairs, the MOSS
    # winnowing pair; hard_negative_mining, within-cell contrastive
    # mining over the shared quantizer; span_excised_docs, the
    # duplicated-span removal transform; source_drift_kl, the
    # per-source KL snapshot-drift monitor — each mirror-green x3 SFs)
    # + 47 @r12 + 50 @r13 + 49 @r14 + 50 @r15 (the two r15 window
    # evictions bpe_encode_top_tokens and approx_distinct_users sit in
    # the 47 @r12; duplicate_span_docs moved from @r14 into this
    # window).
    # The r16 window = the 12 never-checked + the 38 alphabetically-
    # first r12-era names (bpe_encode_top_tokens and
    # approx_distinct_users, the logged r15 evictions, are
    # alphabetically early and so lead that tier automatically) = 50
    # exactly; the 9 r12-era deferrals are sketch_distinct_accuracy,
    # streaming_approx_daily_users, textrank_keywords,
    # theta_overlap_users, token_length_histogram,
    # topk_orders_by_price, vocab_growth_curve,
    # window_running_order_total, window_top3_customers_per_nation
    # (all unchanged, evidence age then 4 rounds — flag for priority
    # in r17). Any query whose CODE changes in r16 outranks backlog
    # per the standing rule. After that window, no name's evidence is
    # older than r13 except the 9 logged deferrals.
    # -- never driver-checked (r14 additions, each mirror-green x3 SFs;
    #    streaming_repetition_gate also r15-code-changed) --
    "doc_repetition_profile",
    "repetition_filter_census",
    "streaming_repetition_gate",
    "lm_doc_perplexity",
    "lm_ppl_bucket_census",
    "lm_ppl_tercile_cutoffs",
    "mmr_diverse_topk",
    # -- last driver row r10 (the logged r14 deferral) --
    "orders_per_region",
    # -- last driver row r11 (all 38) --
    "ann_lsh_topk",
    "cosine_topk",
    "customer_balance_tiles",
    "event_transition_matrix",
    "heavy_hitter_tokens",
    "incremental_dedup_new_docs",
    "label_centroids",
    "label_cohesion_stats",
    "minhash_candidate_pairs",
    "minhash_lsh_buckets",
    "mixture_resample_docs",
    "nvd_cvss_vector_parse",
    "nvd_feed_ingest",
    "nvd_flagship_linux_cves",
    "oov_rate_by_vocab",
    "q22_idle_rich_customers",
    "repetition_ngram_profile",
    "scd2_event_type_intervals",
    "sequence_packing",
    "session_window_per_user",
    "simhash_near_dup_pairs",
    "sketch_percentile_accuracy",
    "source_mixture_weights",
    "span_contamination_census",
    "stateful_user_totals",
    "stratified_sample_per_lang",
    "streaming_cdc_user_totals",
    "streaming_dedup_within_watermark",
    "streaming_funnel_conversion",
    "streaming_upsert_user_totals",
    "tfidf_top_terms",
    "udaf_median_chars",
    "udtf_token_chunks",
    "unigram_surprisal_scores",
    "variant_props_stats",
    "weekly_retention_cohorts",
    "weighted_sample_docs",
    "zorder_cell_census",
    # -- last driver row r12 (alphabetically first 2; the 3rd/4th
    #    slots went to code-changed queries — see header) --
    "agg_count_scalar",
    "anti_join_customers_without_orders",
    # -- code changed in r15 (quantizer extracted into
    #    _ivf_assign_and_probes, shared with mmr_ann_diverse_topk;
    #    oracle byte-identical, mirror-green x3 SFs post-refactor) --
    "ivf_topk",
    # -- code changed in r15 (dup-span relation extracted into the
    #    shared_stage-memoized _dup_span_keys, shared with the census
    #    and the new excision transform; mirror-green x3 SFs) --
    "duplicate_span_docs",
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
