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
    # --- round 8: the round-7 unforced error, fixed (module-scope pandas
    # import) and now FIRST in the window — never driver-sampled ---
    "agg_weighted_median_udaf",
    "agg_weighted_median_exact",  # scale-safe histogram twin, shared oracle (new r8)
    "pipeline_manifest_erased_live",  # erase interleaved mid-stream, live service (new r8)
    "pipeline_service_health",  # per-batch sink-family observability rows (new r8)
    "join_any_left",  # LEFT ANY JOIN strictness, aggregate-then-join (new r8)
    "table_summing_merge",  # SummingMergeTree merge-time pre-aggregation (new r8)
    "table_agg_state_read",  # AggregatingMergeTree -State blobs merged at read (new r8)
    "streaming_summing_mv",  # MV -> Summing target parts under real triggers (new r8)
    "table_projection_route",  # projection layout auto-selected by filter cols (new r8)
    "table_update_mutation",  # ALTER UPDATE part-rewrite mutation (new r8)
    "table_ttl_column",  # column-level TTL: values expire, rows remain (new r8)
    "table_lightweight_delete",  # DELETE FROM: instant mask, deferred merge (new r8)
    "vector_ann_mrl_rerank_topk",  # Matryoshka adaptive two-stage retrieval (new r8)
    "agg_combinators_if",  # ClickHouse -If combinator family, one hash aggregate (new r8)
    "text_bpe_apply",  # tokenizer application: top-3 merges, exact counts (new r8)
    "vector_ann_erased_live_topk",  # erase_vectors between live micro-batches (new r8)
    "table_collapsing_read",  # CollapsingMergeTree sign-collapse chain (new r8)
    "table_ttl_rollup",  # TTL GROUP BY: aged partitions downsampled in place (new r8)
    "table_merge_engine",  # Merge engine: regex union + _table virtual col (new r8)
    "table_row_policy",  # row-level security compiled to scan predicates (new r8)
    "dedup_paragraph_exact",  # sub-document C4-style paragraph dedup (new r8)
    "join_array_left",  # ARRAY JOIN vs LEFT ARRAY JOIN, one explode_outer pass (new r8)
    "agg_combinators_array",  # -Array combinators: row-local reduce vs explode (new r8)
    "agg_combinators_distinct",  # -Distinct combinators via Catalyst Expand (new r8)
    "table_optimize_dedup",  # OPTIMIZE FINAL DEDUPLICATE full-row merge (new r8)
    "join_dict_range_hashed",  # RANGE_HASHED dictionary, broadcast + residual (new r8)
    "pipeline_cascade_erased",  # GDPR scrub of the cascade warehouse itself (new r8)
    "pipeline_leakage_safe_split",  # cluster-aware train/val/test split (new r8)
    "streaming_collapsing_mv",  # MV -> VersionedCollapsing target, live cancels (new r8)
    "table_materialized_column",  # ADD COLUMN DEFAULT read + MATERIALIZE (new r8)
    "pipeline_cascade_erased_live",  # cascade scrub between live micro-batches (new r8)
    "table_parts_report",  # system.parts from parquet footers only (new r8)
    "pipeline_leakage_safe_split_erased",  # split x erase composition (new r8)
    "pipeline_leakage_safe_split_day3",  # split x promotion, full multi-gen graph (new r8)
    "dedup_cluster_profile",  # duplication profile: cluster-size histogram (new r8)
    "pipeline_sampling_weights",  # 1/cluster-size duplication-aware weights (new r8)
    "agg_with_totals",  # WITH TOTALS, totals_mode=before_having pinned (new r8)
    "sort_limit_by",  # ClickHouse LIMIT n BY, WindowGroupLimit partial top-n (new r8)
    "join_dict_ip_trie",  # CIDR longest-prefix dictionary, banded equi-join (new r8)
    "table_detach_attach_partition",  # DETACH/ATTACH/MOVE PARTITION renames (new r8)
    "vector_ann_filtered_topk",  # filtered vector search, exact pre-filter (new r8)
    "vector_ann_filtered_read_topk",  # filtered ANN from the IVF index (new r8)
    "sort_limit_with_ties",  # LIMIT WITH TIES via date-histogram allow-list (new r8)
    "table_freeze_restore",  # FREEZE snapshot round trip erases the mutation (new r8)
    "table_exchange_tables",  # atomic rebuild-aside two-table swap (new r8)
    "text_selection_curve",  # distributed exact NTILE decile curve (new r8)
    "pipeline_cascade_compacted_live",  # merges concurrent with inserts (new r8)
    "table_detached_parts",  # system.detached_parts footer report (new r8)
    "q1_pricing_summary",  # avg columns hardened to integer micros (changed r8, fuzz finding)
    "mv_analytics_projection",  # flagship, pinned inside the window
    # --- oldest-green rotation (VERDICT r8 #5): what fits of the round-2
    # cohort the r7 window displaced (last sampled r2); agg_moving_avg,
    # agg_statistical_moments, dedup_decontaminate,
    # multimodal_audio_features, multimodal_frame_stats,
    # multimodal_image_features, multimodal_resize_stats displaced by the
    # nine late-r8 rows above (the new-query invariant outranks
    # rotation), along with the agg_quantile_exact_weighted and
    # vector_ann_ingested_topk re-confirmations (both r7-green; the
    # ingested family's rebuild keeps three sibling rows in-window) —
    # all join the r9 rotation debt ---
    # q11_important_stock,
    # q13_customer_distribution,
    # q15_top_supplier,
    # q17_small_quantity_revenue,
    # q20_potential_part_promotion,
    # q21_waiting_suppliers,
    # q4_late_shipments,
    # q7_volume_shipping,
    # q9_product_type_profit,
    # sample_consistent_hash,
    # sample_per_group, scalar_url_functions, text_chunk_udtf,
    # text_chunk_windows, text_pii_scrub, text_sequence_packing,
    # text_simhash, text_vocab_top_terms, training_data_prep,
    # vector_ann_cosine_topk, vector_ann_lsh_topk displaced by the
    # eleven late-r8 rows (the new-query invariant outranks rotation);
    # they join the r9 rotation debt below ---
    # --- round-3 cohort head (the window holds what fits after the new
    # r8 rows + the full r2 cohort; the REMAINING 39 r3 rows are the r9
    # rotation debt — front them oldest-first next round: agg_cramers_v,
    # agg_linear_regression, agg_sequence_count, agg_time_decayed_avg,
    # dedup_exact, dedup_incremental_new_batch, dedup_ngram_jaccard_pairs,
    # funnel_conversion, join_asof_last_click, join_asof_tolerance,
    # join_dict_get, mv_message_type_stats, mv_union_streams_monthly,
    # q14/q16/q18/q19/q22/q2, range_join_incident_events,
    # retention_cohorts, scalar_{array_transforms,encoding,geo,ip,
    # rounding,uuid}_functions, session_window_events, text_{fingerprint,
    # lang_id,ngram_distance,quality_score,stats,token_count},
    # timeseries_gap_fill, tumbling_window_daily_events,
    # window_{funnel_depth,lag_events,range_frame_events} ---
]

_PRIORITY_R7 = [
    # --- round 7 window (kept for history; all 50 driver-green in r7) ---
    "pipeline_manifest_ingested_erased",  # ingest x erase composition cell (new r7)
    "vector_matryoshka_topk",  # prefix-truncation retrieval audit, MRL (new r7)
    "streaming_sketch_state",  # HLL state across real multi-trigger accumulation (new r7)
    "graph_pagerank_topk",  # integer-exact PageRank supersteps (new r7)
    "pipeline_shard_report",  # manifest shard-balance audit (new r7)
    "join_bloom_semi_reduction",  # deterministic bloom-join fact reduction (new r7)
    "multimodal_keyframe_select",  # shot-boundary keyframe per video, real decode (new r7)
    "table_upsert_latest",  # ReplacingMergeTree physical upsert contract (new r7)
    "table_read_final",  # SELECT FINAL read-time resolution (new r7)
    "table_ttl_expiry",  # MergeTree TTL whole-partition drops (new r7)
    "text_bpe_merges",  # BPE first-merge pair statistics over the vocabulary (new r7)
    "dedup_containment_pairs",  # asymmetric subset-duplicate containment (new r7)
    "agg_ddsketch_quantiles",  # mergeable relative-error quantile sketch contract (new r7)
    "join_paste_positional",  # PASTE JOIN via distributed global row index (new r7)
    "pipeline_manifest_ingested",  # composed NATS-envelope ingest + index maintainers (new r7)
    "pipeline_ingest_audit",  # cascade half of the composed run, per-row (new r7)
    "pipeline_manifest_erased",  # GDPR erase == never-saw, index surgery (new r7)
    "pipeline_manifest_erased_day3",  # erase-after-promotion: generational replay (new r7)
    "pipeline_dataset_card_erased_day3",  # erasure x promotion x card composition (new r7)
    "vector_ann_erased_appended_topk",  # erase over the appended+compressed index (new r7)
    "text_bm25_topk",  # Okapi BM25 retrieval over corpus stats (new r7)
    "text_dsir_weights",  # DSIR importance weights, hashed features (new r7)
    "pipeline_epoch_mix",  # temperature-scaled source mixing plan (new r7)
    "text_bigram_lm_score",  # integer half-away avg rounding (engine-portable) (r7)
    "agg_hll_state_merge",  # DataSketches HLL -State/-Merge contract (new r7)
    "pipeline_dedup_provenance",  # per-doc dedup explainability + attribution (new r7)
    "pipeline_dedup_provenance_day3",  # cross-generation attribution off the labeled graph (new r7)
    "pipeline_dedup_provenance_erased",  # the repaired graph still explains itself (new r7)
    "pipeline_manifest_erased_day4",  # N-generation erase induction instance (new r7)
    "dedup_decontaminate_semantic",  # embedding-space eval-leakage flags (new r7)
    "text_bm25_read_topk",  # BM25 from the partition-pruned inverted index (new r7)
    "pipeline_dataset_card_erased",  # erasure composes across consumers (new r7)
    "vector_ann_erased_topk",  # partition-pruned vector erasure (new r7)
    "pipeline_manifest_day4",  # two sequential promotions, N-generation loop (new r7)
    "vector_ann_ivfpq_appended_topk",  # compressed read over the appended index (new r7)
    "vector_ann_ingested_topk",  # ANN maintained by the composed service (new r7)
    "vector_ann_pq_topk",  # kernel-local partial top-k landed (r7)
    "vector_ann_ivfpq_read_topk",  # kernel-local partial top-k landed (r7)
    "vector_ann_ivf_appended_topk",  # append path now drift-guards BEFORE write (r7)
    "pipeline_manifest_incremental",  # tables rebuilt with corpus_pairs / MAT_VERSION 5 (r7)
    "pipeline_manifest_streamed",  # same rebuild (r7)
    "pipeline_manifest_day3",  # promotion now swaps rename-aside + pairs pass-through (r7)
    "pipeline_dataset_card",  # same rebuilt tables (r7)
    "pipeline_dataset_card_day3",  # same rebuilt tables (r7)
    "dedup_lsh_pairs_read",  # same rebuilt tables (r7)
    "agg_delta_sum",
    "agg_entropy",
    "agg_histogram",
    "agg_min_max_map",
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
