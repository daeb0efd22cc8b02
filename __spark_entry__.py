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
    # --- round 5: new queries (never driver-sampled) ---
    "pipeline_manifest_incremental",  # materialized-pipeline read path
    "streaming_late_data_drop",       # watermark-eviction proof
    "vector_ann_ivf_read_topk",       # materialized IVF index + DPP scan
    "pipeline_dataset_card",          # mix report off the read path
    "streaming_stateful_running_counts",  # applyInPandasWithState proof
    "join_skew_salted",               # salted join/agg vs unsalted oracle
    # only driver rows are r1 reds/weak (no_oracle / unhashable / hash
    # mismatch) — fixed since but never re-sampled; caught by the
    # mechanized staleness gate (tools/staleness.py), must re-front
    "agg_approx_distinct",
    "agg_group_array_types",
    "q12_priority_by_linestatus",
    "scalar_array_functions",
    # --- round 5: engine and/or oracle changed -> must re-sample ---
    "scalar_readable_timedelta",      # truncation contract documented
    "join_interval_overlap",          # oracle degenerate-interval filter
    "dedup_survivors",                # max_bucket=None parity + CC seed
    "dedup_connected_components",     # CC neighbor-min init + empty exit
    "dedup_minhash_lsh_pairs",        # shares CC-adjacent pair pipeline
    "pipeline_training_manifest",     # composes gopher + survivors
    "text_gopher_rules",              # refactored through gopher_flags
    "join_asof_nearest",              # nearest mode gained direct tests
    # --- flagship + streaming family (the reference's core semantics) ---
    "mv_analytics_projection",
    "streaming_tumbling_daily",
    "streaming_sliding_12h",
    "streaming_session_windows",
    "streaming_dedup_counts",
    "streaming_stream_stream_join",
    "streaming_static_enrich",
    # --- r4-green rows rotating through re-confirmation ---
    "join_dict_hierarchy",
    "behavioral_retention_matrix",
    "scalar_hash_functions",
    "agg_partial_state_merge",
    "scalar_timezone_functions",
    "timeseries_period_power",
    "behavioral_markov_transitions",
    "timeseries_anomaly_mad",
    "text_boilerplate_ngrams",
    "vector_hard_negatives",
    "window_funnel_strict_order",
    "scalar_zorder_key",
    "text_tfidf_keywords",
    "scalar_point_in_polygon",
    "agg_sparkbar",
    "agg_student_ttest",
    "agg_contingency_coefs",
    "text_global_shuffle",
    "text_bigram_lm_score",
    "vector_quantize_int8",
    "agg_mann_whitney",
    "agg_ks_test",
    "agg_theils_u",
    "agg_categorical_iv",
    "scalar_string_distance",
    "agg_lttb_downsample",
    "dedup_semantic_buckets",
    "agg_topk_weighted",
    "scalar_bit_functions",
    "agg_retention_flags",
    "scalar_null_semantics",
    "agg_bounding_ratio",
    "vector_ann_cosine_topk",
    "agg_linear_regression",
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
