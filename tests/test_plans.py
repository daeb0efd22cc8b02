"""Physical-plan shape assertions — the 100 TB posture, checked in CI.

A query that silently loses predicate pushdown, broadcasts nothing, or
reads all columns is a scale regression even when its results stay
correct. These tests pin the plan features that matter:

* filters reach the Parquet scan (PushedFilters),
* column pruning reaches the scan (ReadSchema),
* dimension joins broadcast (BroadcastHashJoin, no shuffle of the fact),
* aggregations are partial+final (two HashAggregate phases),
* global top-k plans as TakeOrderedAndProject (never a full sort),
* hot paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

import pytest

from go_nats_to_clickhouse_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestPushdownAndPruning:
    def test_q6_filters_pushed_to_scan(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q6_revenue_forecast")
        assert "PushedFilters:" in plan
        # range predicates on shipdate/discount/quantity reach the reader
        assert "GreaterThanOrEqual(l_shipdate" in plan
        assert "LessThan(l_quantity" in plan

    def test_q6_column_pruning(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q6_revenue_forecast")
        # ReadSchema must not include untouched wide columns
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "l_returnflag" not in read_schema
        assert "l_extendedprice" in read_schema

    def test_scalar_query_prunes_columns(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "scalar_date_functions")
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "o_totalprice" not in read_schema and "o_custkey" not in read_schema


class TestJoinStrategies:
    @pytest.mark.parametrize(
        "name", ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items"]
    )
    def test_dimensions_broadcast(self, spark, sf_dir, name):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan

    def test_anti_and_semi_join_operators(self, spark, sf_dir):
        anti = _plan(spark, sf_dir, "join_anti_customers_without_orders")
        semi = _plan(spark, sf_dir, "join_semi_active_suppliers")
        assert "LeftAnti" in anti
        assert "LeftSemi" in semi


class TestAggregationShape:
    def test_q1_partial_final_agg(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q1_pricing_summary")
        # partial (map-side) + final HashAggregate pair around one exchange
        assert plan.count("HashAggregate") >= 2
        assert "Exchange" in plan

    def test_q1_agg_is_partial_then_final(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "q1_pricing_summary")
        assert "partial_sum" in plan  # map-side combine before the shuffle

    @pytest.mark.parametrize(
        "name",
        [
            "q1_pricing_summary",
            "mv_analytics_projection",
            "dedup_minhash_lsh_pairs",
            "text_simhash",
            "window_lag_events",
        ],
    )
    def test_jvm_only_queries_have_no_python_eval(self, spark, sf_dir, name):
        # The hot path must stay inside codegen'd JVM operators; a
        # BatchEvalPython/ArrowEvalPython node means a Python UDF snuck in.
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan and "PythonUDF" not in plan


class TestTopK:
    def test_global_topk_avoids_full_sort(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "sort_limit_expensive_parts")
        assert "TakeOrderedAndProject" in plan

    def test_grouped_topk_uses_window_group_limit(self, spark, sf_dir):
        # Spark 3.5+ pushes rn <= k into WindowGroupLimit before the sort
        plan = _plan(spark, sf_dir, "window_topk_orders")
        assert "WindowGroupLimit" in plan or "Window" in plan
