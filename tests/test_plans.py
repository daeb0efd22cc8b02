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

import re

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


class TestRound9Shapes:
    def test_q8_star_is_all_broadcast_with_one_shuffle(self, spark, sf_dir):
        """The 8-table q8 star must broadcast every dimension side — but
        UNHINTED (VERDICT r9 #2): the scaling dims (part, supplier,
        customer) carry no F.broadcast, so this pin executes the query
        and asserts AQE's FINAL adaptive plan still chose broadcast for
        every dimension join from its measured runtime sizes. The fact
        table never sorts for a join; the only hash Exchanges are the
        final year agg plus AQE's materialization points."""
        from go_nats_to_clickhouse_spark.queries import QUERIES

        df = QUERIES["q8_national_market_share"](spark, sf_dir)
        df.collect()  # materialize so AQE finalizes every join choice
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # assert on the FINAL executed plan; the "== Initial Plan ==" tail
        # legitimately shows the static SortMergeJoin that AQE converted
        final = plan.split("== Initial Plan ==")[0]
        assert "ResultQueryStage" in final  # plan is finalized
        tree = final.split("\n\n")[0]  # operator tree, before per-op details
        assert tree.count("BroadcastHashJoin") == 7  # 4 fact-level + s-n2, c-n1, n1-region
        assert "SortMergeJoin" not in final
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
        # part's p_type filter is pushed, and lineitem reads only its
        # join keys + money columns (no l_shipdate et al.)
        assert any("EqualTo(p_type,STANDARD)" in l for l in plan.splitlines())
        li = [l for l in read_schema if "l_extendedprice" in l][0]
        assert "l_shipdate" not in li and "l_quantity" not in li

    def test_repeated_substring_shuffles_hashes_not_grams(self, spark, sf_dir):
        """The substring-dedup shuffle keys must be the 8-byte xxhash64
        gram keys, never the ~100-byte gram strings, and the islands
        window must partition by document (no global window)."""
        plan = _plan(spark, sf_dir, "dedup_repeated_substring")
        gram_shuffles = [
            l for l in plan.splitlines()
            if "hashpartitioning" in l and "gram#" in l
        ]
        assert gram_shuffles == [], gram_shuffles
        assert "Window" in plan
        win = [l for l in plan.splitlines() if "partitionBy" in l.lower()
               or "windowspecdefinition" in l.lower()]
        assert any("doc_id" in l for l in win), win
