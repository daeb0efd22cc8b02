"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries`` exposes every
implemented operator from SURVEY.md §2 (+ extensions); ``oracle_sql`` gives
the DuckDB-equivalent SQL per query for the hash-compare correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_nats_to_clickhouse_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's own richest relational expression: the
    full ingest -> MV-cascade analytics projection (init.sql:100-121).
    """
    return QUERIES["mv_analytics_projection"](spark, "/root/testdata/sf0.001")


#: Queries a budget-capped correctness harness should reach FIRST (the
#: driver samples the first 50 registrations). Invariant maintained every
#: time a query is added: every never-driver-sampled query and every query
#: whose engine/oracle changed this round sits INSIDE the first 50, with
#: the flagship pinned at index <= 49; already-double-green re-confirmation
#: rows yield their slots first. The rest keep registration order behind.
_PRIORITY = [
    # --- round 9: changed/new rows first (staleness invariant) ---
    "timeseries_resample_interpolate",  # integer-micros rounding fix (fuzz seeds 99/3, changed r9)
    "table_skip_index_lookup",  # parquet-bloom skip-index point lookup (new r9)
    "system_query_log",  # per-query accounting table, admission-fed (new r9)
    "pipeline_manifest_promoted_live",  # promotion between live micro-batches (new r9)
    "q8_national_market_share",  # last TPC-H pattern — 22/22 now covered (new r9)
    "dedup_repeated_substring",  # exact-substring dedup, Lee et al. span merge (new r9)
    "table_token_skip_search",  # tokenbf_v1 analog — token-bloom pruned hasToken (new r9)
    "table_ngram_skip_like",  # ngrambf_v1 analog — ngram-bloom pruned LIKE (new r9)
    "mv_analytics_projection",  # flagship, pinned inside the window
    # --- round-9 rotation-debt payment (VERDICT r8 #2): the window's
    # remaining 48 slots go to the oldest greens, oldest-first. Debt at
    # round start: 30 r2 + 42 r3 + 18 r4 = 90 rows against 50 slots — the
    # full r2 cohort plus the r3 head fit; the r3 tail + the 18 r4 rows
    # remain round-10 debt (listed at the bottom). Every NEW r9 query
    # displaces the youngest debt row here (the r3 tail), never an r2 row.
    # --- full round-2 cohort (last driver-green r2) ---
    "agg_moving_avg",
    "agg_statistical_moments",
    "dedup_decontaminate",
    "multimodal_audio_features",
    "multimodal_frame_stats",
    "multimodal_image_features",
    "multimodal_resize_stats",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q20_potential_part_promotion",
    "q21_waiting_suppliers",
    "q4_late_shipments",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "sample_consistent_hash",
    "sample_per_group",
    "scalar_url_functions",
    "text_chunk_udtf",
    "text_chunk_windows",
    "text_pii_scrub",
    "text_sequence_packing",
    "text_simhash",
    "text_vocab_top_terms",
    "training_data_prep",
    "vector_ann_cosine_topk",
    "vector_ann_lsh_topk",
    "vector_neardup_pairs",
    "vector_norms",
    # --- round-3 cohort head (alphabetical = deterministic oldest-first
    # within the equal-age cohort) ---
    "agg_approx_percentile_bounds",
    "agg_bitmap_cardinalities",
    "agg_cramers_v",
    "agg_linear_regression",
    "agg_quantile_exact_weighted",
    "agg_sequence_count",
    "agg_time_decayed_avg",
    "dedup_exact",
    "dedup_incremental_new_batch",
    "dedup_ngram_jaccard_pairs",
    "funnel_conversion",
    # --- round-10 debt (does NOT fit this round; front these next):
    # r3 tail: join_asof_last_click (displaced by
    # table_ngram_skip_like), join_asof_tolerance (displaced by
    # table_token_skip_search), join_dict_get (displaced by
    # dedup_repeated_substring),
    # mv_message_type_stats (displaced by
    # q8_national_market_share), mv_union_streams_monthly (displaced by
    # pipeline_manifest_promoted_live),
    # q14_promo_revenue_ratio (displaced by system_query_log),
    # q16_supplier_count_by_part (displaced by
    # table_skip_index_lookup), q18_large_volume_orders,
    # q19_disjunctive_join_filter,
    # q22_dormant_rich_customers, q2_best_supplier_per_part,
    # range_join_incident_events, retention_cohorts,
    # scalar_{array_transforms,encoding,geo,ip,rounding,uuid}_functions,
    # session_window_events, text_{fingerprint,lang_id,ngram_distance,
    # quality_score,stats,token_count}, timeseries_gap_fill,
    # tumbling_window_daily_events, window_{funnel_depth,lag_events,
    # range_frame_events};
    # r4 cohort: agg_bounding_ratio, agg_covar_corr,
    # agg_interval_length_sum, agg_lttb_downsample, agg_max_intersections,
    # agg_rank_corr, agg_retention_flags, agg_topk_weighted,
    # agg_welch_ttest, behavioral_next_event, dedup_semantic_buckets,
    # scalar_{bit,null_semantics,string_search}_functions,
    # text_mix_report, text_repetition_ratio, vector_distance_functions ---
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, priority
    (see ``_PRIORITY``) first."""
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update(QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same table views)."""
    return dict(ORACLES)
