"""go_nats_to_clickhouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``sergey-arkhipov/go-nats-to-clickhouse`` (a NATS JetStream -> ClickHouse
micro-batch ingester with an in-database materialized-view cascade), built
Spark-first:

* ingestion  -> Structured Streaming micro-batches (count + time triggers,
  flush-on-stop, at-least-once via checkpointing)  [ref: main.go:110-212]
* MV cascade -> declarative DataFrame transforms applied per micro-batch
  (raw -> union -> analytics)                      [ref: init.sql:49-121]
* MergeTree layout -> partitioned + sorted Parquet [ref: init.sql:17-19]
* ad-hoc SQL surface (delegated to ClickHouse in the reference) -> Spark SQL
* plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis) designed for a 1000-executor / 100 TB posture.

Everything here is public-API PySpark; no code is copied from the reference.
"""

from go_nats_to_clickhouse_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
