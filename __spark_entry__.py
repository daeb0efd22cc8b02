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
    # --- round 6: new queries + this round's engine/oracle changes ---
    "pipeline_manifest_day3",  # promoted-corpus read path (new r6)
    "pipeline_manifest_streamed",  # streamed-index manifest, replay baked in (new r6)
    "vector_ann_ivf_appended_topk",  # incremental ANN append path (new r6)
    "dedup_lsh_pairs_read",  # pair feed off the band index (new r6)
    "pipeline_dataset_card_day3",  # promotion composes across consumers (new r6)
    "dedup_index_stats",  # LSH bucket-health off the band index (new r6)
    "vector_ann_pq_topk",  # product-quantization ADC + exact re-rank (new r6)
    "vector_ann_ivfpq_read_topk",  # materialized IVF-PQ, both pruning axes (new r6)
    "pipeline_manifest_incremental",  # consumer refactored duplicate-invariant (r6)
    "pipeline_dataset_card",  # oracle CTEs recomposed (r6)
    "scalar_readable_timedelta",  # integral-div decomposition (r6)
    "vector_ann_ivf_read_topk",  # index rebuilt under ANN_VERSION 3 (r6)
    "vector_ann_ivf_topk",  # r2-green rotating + shared assign kernel changed
    "text_tfidf_keywords",  # r6 perf adjudication reverted the r5 repartition
    "mv_analytics_projection",  # flagship, pinned inside the window
    # --- oldest-green rotation (VERDICT r5 #3): the full round-1
    # cohort (34) plus the 7 oldest round-2 greens re-front through
    # every spare re-confirmation slot ---
    "agg_argmax_latest_event",
    "agg_conditional",
    "agg_cube_orders",
    "agg_distinct_orders",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_rollup_lineitem",
    "agg_sequence_match",
    "agg_sum_map_props",
    "agg_topk_heavy_hitters",
    "agg_uniq_up_to",
    "join_anti_customers_without_orders",
    "join_semi_active_suppliers",
    "market_share_by_year",
    "pivot_status_by_priority",
    "q10_returned_items",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "scalar_conditional_functions",
    "scalar_date_functions",
    "scalar_json_functions",
    "scalar_map_functions",
    "scalar_math_functions",
    "scalar_regexp_functions",
    "scalar_string_functions",
    "set_except_never_urgent",
    "set_intersect_big_spenders",
    "set_ops_bag_semantics",
    "sort_limit_expensive_parts",
    "window_ranking_functions",
    "window_running_spend",
    "window_topk_orders",
    "agg_bit_ops",
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
