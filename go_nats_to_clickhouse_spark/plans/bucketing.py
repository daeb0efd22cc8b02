"""Bucketed catalog tables — co-located joins without a shuffle.

ClickHouse gets cheap merges/joins on its sort key because every part is
already ordered; Spark's equivalent physical design is **bucketing**: both
tables hash-partitioned into the same number of buckets on the join key at
write time, so a later equi-join reads bucket i against bucket i with NO
exchange on either side. At 100 TB, pre-bucketing the two biggest fact
tables on their join key turns the dominant shuffle of every downstream
join/aggregation on that key into a local merge — this module is that
design choice, testable (tests/test_bucketing.py asserts the Exchange
disappears from the plan).

Bucketed writes need a catalog table (``saveAsTable``), so the
SparkSession must have a warehouse dir; ``spark-warehouse`` under CWD by
default, or set ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key. With matching bucket
    counts Spark plans SortMergeJoin with zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on)
