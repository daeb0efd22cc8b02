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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same table views)."""
    return dict(ORACLES)
