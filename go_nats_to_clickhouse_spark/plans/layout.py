"""MergeTree-equivalent physical layout for engine tables.

Reference physical design (init.sql:17-19, 94-96):
  ENGINE = MergeTree()  PARTITION BY toYYYYMM(timestamp)  ORDER BY (<keys>)

Spark-native equivalent, and why it holds at 100 TB:

* ``PARTITION BY toYYYYMM`` -> Hive-style directory partitioning on a
  materialized ``ym`` int column. Catalyst prunes partitions from any
  predicate on ``ym`` (and on ``timestamp`` once queries filter through the
  helper below) — a month-scoped query over 10 years of data scans ~0.8%
  of files before a single row is read.
* ``ORDER BY (...)`` (sparse primary index) -> ``sortWithinPartitions`` on
  the same keys before write. Parquet row-group min/max statistics then
  give data-skipping on those columns, which is the same read-elimination
  mechanism as ClickHouse's sparse index (granule skipping).
* MergeTree background merges -> :func:`compact_table`, an explicit
  compaction pass that rewrites a partition's many micro-batch files into
  few large sorted files. Streaming appends create small files by design
  (one per trigger per task); at scale, compaction is what keeps scan
  parallelism and open-file costs sane.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.functions.clickhouse import to_yyyymm

#: sort keys per engine table (init.sql:19,32,46,96)
SORT_KEYS: dict[str, tuple[str, ...]] = {
    "raw": ("timestamp", "chat_id", "sequence"),
    "all_streams": ("timestamp", "chat_id", "sequence"),
    "analytics": ("client_code", "project_code", "user_id", "session_id", "timestamp"),
}

PARTITION_COL = "ym"


def with_partition_col(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Materialize the monthly partition key toYYYYMM(timestamp) -> ym."""
    return df.withColumn(PARTITION_COL, to_yyyymm(ts_col))


def write_partitioned(
    df: DataFrame,
    path: str,
    sort_keys: tuple[str, ...],
    ts_col: str = "timestamp",
    mode: str = "append",
) -> None:
    """Append a batch in MergeTree-like layout: monthly dirs, sorted files."""
    out = with_partition_col(df, ts_col).sortWithinPartitions(*sort_keys)
    out.write.mode(mode).partitionBy(PARTITION_COL).parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a layout table; ym comes back as a partition column and prunes."""
    return spark.read.parquet(path)


def compact_table(
    spark: SparkSession,
    path: str,
    sort_keys: tuple[str, ...],
    target_files_per_partition: int = 1,
    partition_cols: tuple[str, ...] = (PARTITION_COL,),
) -> None:
    """Rewrite a table into few large sorted files per partition — the
    analog of MergeTree background merges. Run periodically, not per batch.
    ``partition_cols`` must match the table's existing layout (e.g.
    ("stream", "ym") for the per-stream raw table). Writes to a temp
    location, renames the old directory aside, swaps the new one in, then
    deletes the old — at no point is the table path absent with the data
    only in a temp dir, so a crash at any step leaves either the old or the
    new table readable (plus at most a leftover __compact_old to sweep)."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    (
        df.repartition(target_files_per_partition, *[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*sort_keys)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(tmp)
    )
    # Local-FS swap; on a real deployment this would be a metastore/table
    # format (Delta/Iceberg) commit instead.
    import shutil

    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a previous crashed swap
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
