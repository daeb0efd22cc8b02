"""Catalog surface: register engine warehouse tables + testdata as SQL views.

The reference delegates all ad-hoc querying to ClickHouse SQL over the
tables its service populates (SURVEY.md §0); our analog is ``spark.sql``
over the warehouse the streaming pipeline writes. After
``register_warehouse``, every engine table is queryable by name, with ym
partition pruning intact.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from go_nats_to_clickhouse_spark.schemas import register_testdata  # noqa: F401
from go_nats_to_clickhouse_spark.streaming.pipeline import (
    ALL_STREAMS_TABLE,
    ANALYTICS_TABLE,
    DEAD_LETTER_TABLE,
)

ENGINE_TABLES = (
    "nats_data_stream",
    ALL_STREAMS_TABLE,
    ANALYTICS_TABLE,
    DEAD_LETTER_TABLE,
)


def register_warehouse(spark: SparkSession, warehouse_dir: str) -> list[str]:
    """Register every existing warehouse table as a temp view; returns the
    registered names."""
    registered = []
    for name in ENGINE_TABLES:
        path = os.path.join(warehouse_dir, name)
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
            registered.append(name)
    return registered


def cancel_after(spark: SparkSession, seconds: float, group: str = "gntcs-query"):
    """Query-timeout watchdog — the analog of the reference's ClickHouse
    client setting ``max_execution_time: 60`` (connection/connection.go:55-57).

    Usage::

        with cancel_after(spark, 60):
            df.collect()   # cancelled (job group killed) after 60 s

    Implemented with a job group + a timer calling cancelJobGroup; Spark
    has no per-query timeout primitive, so this is the documented pattern.
    """
    import threading
    from contextlib import contextmanager

    @contextmanager
    def _ctx():
        sc = spark.sparkContext
        sc.setJobGroup(group, f"timeout={seconds}s", interruptOnCancel=True)
        timer = threading.Timer(seconds, lambda: sc.cancelJobGroup(group))
        timer.daemon = True
        timer.start()
        try:
            yield
        finally:
            timer.cancel()
            sc.setJobGroup("", "")

    return _ctx()
