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
    # --- round 11: new rows first (staleness invariant) — the four
    # round-10 stats analogs activated this round (clickhouse_r10
    # register() now called from queries/__init__; agg_anova_f's
    # sum-of-squares also changed engine+oracle this round: decimal38
    # accumulation, see its docstring) ---
    "agg_anova_f",
    "agg_mean_ztest",
    "timeseries_outliers_tukey",
    "timeseries_decompose_seasonal",
    "mv_analytics_projection",  # flagship, pinned inside the window
    # --- round-5 cohort IN FULL (43 rows, last driver-green r5;
    # VERDICT r10 #2), alphabetical within the equal-age cohort ---
    "agg_approx_distinct",
    "agg_categorical_iv",
    "agg_contingency_coefs",
    "agg_group_array_types",
    "agg_ks_test",
    "agg_mann_whitney",
    "agg_partial_state_merge",
    "agg_sparkbar",
    "agg_student_ttest",
    "agg_theils_u",
    "behavioral_markov_transitions",
    "behavioral_retention_matrix",
    "dedup_connected_components",
    "dedup_minhash_lsh_pairs",
    "dedup_survivors",
    "join_asof_nearest",
    "join_dict_hierarchy",
    "join_interval_overlap",
    "join_skew_salted",
    "pipeline_training_manifest",
    "q12_priority_by_linestatus",
    "scalar_array_functions",
    "scalar_hash_functions",
    "scalar_point_in_polygon",
    "scalar_string_distance",
    "scalar_timezone_functions",
    "scalar_zorder_key",
    "streaming_dedup_counts",
    "streaming_late_data_drop",
    "streaming_session_windows",
    "streaming_sliding_12h",
    "streaming_stateful_running_counts",
    "streaming_static_enrich",
    "streaming_stream_stream_join",
    "streaming_tumbling_daily",
    "text_boilerplate_ngrams",
    "text_global_shuffle",
    "text_gopher_rules",
    "timeseries_anomaly_mad",
    "timeseries_period_power",
    "vector_hard_negatives",
    "vector_quantize_int8",
    "window_funnel_strict_order",
    # --- two spare slots: the two NEW round-11 rows (never-sampled
    # rows must sit inside the window; the full round-6 cohort — 39
    # rows — plus flagship fits round 12's window with room left) ---
    "agg_skew_kurt",
    "agg_exp_moving_avg",
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
