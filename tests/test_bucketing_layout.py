"""Physical-design tests: bucketed co-located joins (no Exchange) and
MergeTree-style compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans import layout
from go_nats_to_clickhouse_spark.plans.bucketing import bucketed_join, write_bucketed
from go_nats_to_clickhouse_spark.schemas import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog can forget dirs from prior sessions; clear them
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8, sort_cols=("o_orderkey",))
    write_bucketed(
        l, "b_lineitem", "l_orderkey", n_buckets=8, sort_cols=("l_orderkey",)
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, bucketed_tables):
        bo, bl = bucketed_tables
        # Disable auto-broadcast: at test scale the planner would broadcast
        # (and rightly skip bucketed scans); the property under test is the
        # big-big case where both sides are fact-sized.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = (
                spark.table(bl)
                .join(
                    spark.table(bo),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .select("l_orderkey", "o_totalprice", "l_quantity")
            )
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # co-located: the whole point — no shuffle on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan

    def test_join_result_correct(self, spark, sf_dir, bucketed_tables):
        bo, bl = bucketed_tables
        n_bucketed = (
            spark.table(bl)
            .join(spark.table(bo), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        n_plain = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n_bucketed == n_plain


class TestCompaction:
    def test_compact_merges_small_files(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "tbl")
        e = load_table(spark, sf_dir, "events").select(
            F.col("ts").alias("timestamp"),
            F.lit("s.u.b").alias("subject"),
            F.col("user_id").cast("string").alias("chat_id"),
            F.col("event_id").alias("sequence"),
            F.lit("{}").alias("metadata"),
            F.col("props").alias("data"),
        )
        # simulate many micro-batch appends -> many small files
        for chunk in range(4):
            layout.write_partitioned(
                e.filter(F.col("sequence") % 4 == chunk), path, layout.SORT_KEYS["raw"]
            )
        before = spark.read.parquet(path).count()

        def n_files():
            total = 0
            for root, _dirs, files in os.walk(path):
                total += sum(1 for f in files if f.endswith(".parquet"))
            return total

        files_before = n_files()
        layout.compact_table(spark, path, layout.SORT_KEYS["raw"])
        after = spark.read.parquet(path).count()
        assert after == before  # lossless
        assert n_files() < files_before  # fewer, larger files

    def test_partition_pruning_on_ym(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "pruned")
        e = load_table(spark, sf_dir, "events").select(
            F.col("ts").alias("timestamp"),
            F.lit("s").alias("subject"),
            F.lit("c").alias("chat_id"),
            F.col("event_id").alias("sequence"),
            F.lit("{}").alias("metadata"),
            F.lit("{}").alias("data"),
        )
        layout.write_partitioned(e, path, layout.SORT_KEYS["raw"])
        df = layout.read_table(spark, path).filter(F.col("ym") == 202401)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # the ym predicate must prune at planning time, not filter rows
        assert "PartitionFilters: [isnotnull(ym" in plan
