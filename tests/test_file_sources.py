"""CSV / JSON / Parquet scan layer (sources/files.py): round trips,
schema discipline, pushdown reaching the reader, and the streaming twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.sources.files import (
    read_files,
    scan_report,
    stream_files,
)

ROWS = [(1, "alpha", 10.5), (2, "beta", -3.25), (3, "gamma", 0.0)]
SCHEMA = "id bigint, name string, score double"


@pytest.fixture(scope="module")
def csv_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("csv_src"))
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.mode("overwrite").option(
        "header", "true"
    ).csv(d)
    return d


@pytest.fixture(scope="module")
def json_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("json_src"))
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.mode("overwrite").json(d)
    return d


class TestBatchScans:
    def test_csv_round_trip(self, spark, csv_dir):
        got = sorted(
            read_files(spark, csv_dir, "csv", SCHEMA).collect(), key=lambda r: r.id
        )
        assert [(r.id, r.name, r.score) for r in got] == ROWS

    def test_json_round_trip(self, spark, json_dir):
        got = sorted(
            read_files(spark, json_dir, "json", SCHEMA).collect(), key=lambda r: r.id
        )
        assert [(r.id, r.name, r.score) for r in got] == ROWS

    def test_text_formats_require_schema(self, spark, csv_dir):
        with pytest.raises(ValueError, match="explicit schema"):
            read_files(spark, csv_dir, "csv")

    def test_unknown_format_rejected(self, spark, csv_dir):
        with pytest.raises(ValueError, match="unsupported format"):
            read_files(spark, csv_dir, "orc2", SCHEMA)

    def test_parquet_scan_and_schema_optional(self, spark, sf_dir):
        df = read_files(spark, f"{sf_dir}/part.parquet", "parquet")
        assert df.count() > 0

    def test_filter_pushdown_reaches_csv_scan(self, spark, csv_dir):
        df = read_files(spark, csv_dir, "csv", SCHEMA).filter(F.col("id") > 1)
        report = scan_report(df)
        assert "id" in report["pushed_filters"], report

    def test_column_pruning_reaches_parquet_scan(self, spark, sf_dir):
        df = read_files(spark, f"{sf_dir}/part.parquet", "parquet").select("p_partkey")
        report = scan_report(df)
        assert "p_partkey" in report["read_schema"]
        assert "p_name" not in report["read_schema"]

    def test_filter_pushdown_reaches_parquet_scan(self, spark, sf_dir):
        df = read_files(spark, f"{sf_dir}/part.parquet", "parquet").filter(
            F.col("p_size") > 40
        )
        report = scan_report(df)
        assert "p_size" in report["pushed_filters"], report


class TestStreamScans:
    def test_csv_stream_drains_to_memory_sink(self, spark, csv_dir):
        q = (
            stream_files(spark, csv_dir, "csv", SCHEMA, max_files_per_trigger=1)
            .writeStream.format("memory")
            .queryName("csv_stream_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = sorted(
            spark.sql("SELECT * FROM csv_stream_test").collect(), key=lambda r: r.id
        )
        assert [(r.id, r.name, r.score) for r in got] == ROWS
