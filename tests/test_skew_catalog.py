"""Skew-salting operators, warehouse catalog registration, query watchdog."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.catalog import cancel_after, register_warehouse
from go_nats_to_clickhouse_spark.operators.skew import salted_count, salted_join
from go_nats_to_clickhouse_spark.schemas import MESSAGE_SCHEMA
from go_nats_to_clickhouse_spark.streaming.pipeline import PipelineTables, apply_cascade


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    ).cache()


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(2000)],
            "k string, label string",
        )
        plain = skewed.join(dim, "k").count()
        salted = salted_join(skewed, dim, "k", n_salts=4).count()
        assert salted == plain

    def test_left_join_preserves_unmatched(self, spark, skewed):
        dim = spark.createDataFrame([("hot", "H")], "k string, label string")
        out = salted_join(skewed, dim, "k", n_salts=4, how="left")
        assert out.count() == skewed.count()
        assert out.filter(F.col("label").isNull()).count() == skewed.filter(
            F.col("k") != "hot"
        ).count()


class TestSaltedAgg:
    def test_matches_plain_groupby(self, spark, skewed):
        plain = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
        salted = {r["k"]: r["n"] for r in salted_count(skewed, "k", n_salts=4).collect()}
        assert salted == plain

    def test_sum_variant(self, spark, skewed):
        plain = {r["k"]: r["s"] for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()}
        salted = {r["k"]: r["n"] for r in salted_count(skewed, "k", n_salts=4, agg_col="v").collect()}
        assert salted == plain


class TestCatalog:
    def test_register_warehouse_enables_sql(self, spark, tmp_path):
        ts = dt.datetime(2024, 3, 1, 12, 0, 0)
        rows = [
            (ts, f"globex.supprt.u{i}.c{i}.t", i, "{}", '{"text":"x"}')
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
        tables = PipelineTables(str(tmp_path / "wh"))
        apply_cascade(df, tables)
        names = register_warehouse(spark, str(tmp_path / "wh"))
        assert "analitics_data" in names and "nats_data_all_streams" in names
        got = spark.sql(
            "SELECT client_code, count(*) AS n FROM analitics_data GROUP BY 1"
        ).first()
        assert got["client_code"] == "globex" and got["n"] == 5


class TestWatchdog:
    def test_long_job_is_cancelled(self, spark):
        # a deliberately slow job (python sleep per partition) must be killed
        slow = spark.range(64, numPartitions=8).mapInPandas(
            lambda it: (time.sleep(30) or (yield from it)), "id long"
        )
        t0 = time.time()
        with pytest.raises(Exception):
            with cancel_after(spark, 3):
                slow.count()
        assert time.time() - t0 < 25  # cancelled well before 30 s sleeps finish

    def test_fast_job_unaffected(self, spark):
        with cancel_after(spark, 30):
            assert spark.range(10).count() == 10
