"""Round-9 ClickHouse analogs: secondary skip indexes.

The reference's tables lean on ClickHouse granule skipping beyond the
sort key (init.sql:19,32,46,96 — the sparse primary index plus implicit
per-column min/max). This module exercises the Spark-side analog added
in plans/layout.py: per-column Parquet BLOOM FILTERS on the
high-cardinality lookup columns (``layout.BLOOM_KEYS``), written by the
cascade and preserved by compaction and mutations. A point lookup on a
non-sort-key column skips whole row groups at the parquet-mr layer —
the same read-elimination ClickHouse gets from a ``bloom_filter`` skip
index (tests/test_skip_index.py pins row-groups-skipped > 0 through
parquet-java's own bloom readers, the code path Spark's scan uses).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans.materialize import NEW_SOURCES
from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

_NEW_SRC_SQL = "('" + "', '".join(NEW_SOURCES) + "')"


@query(
    "table_skip_index_lookup",
    f"""
SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars_stored
FROM documents
WHERE source IN {_NEW_SRC_SQL} AND doc_id % 23 = 0
ORDER BY doc_id
""",
)
def table_skip_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on a NON-sort-key column of the cascade's analytics
    table (``message_id``; its sort key is client/project/user/session/
    timestamp, so min/max stats never exclude a row group — only the
    bloom skip index does). The lookup keys are literal strings, so the
    predicate reaches the parquet scan as PushedFilters and parquet-mr's
    row-group filter consults the bloom before decoding a single page —
    ClickHouse's ``INDEX ... TYPE bloom_filter GRANULARITY n`` read path
    (init.sql:19's granule skipping, generalized off the sort key).

    The key list is collected from the documents table first (bounded:
    |batch docs| / 23 ids — the day-2 batch is day-volume-bounded, and
    the modulus keeps the IN-list in the hundreds even at 10^7-doc
    days). The ``project_code`` guard keeps the audit scoped to document
    streams (embedding messages carry their own id space — vec ids and
    doc ids can collide as bare strings)."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import ANALYTICS_TABLE

    docs = load_table(spark, sf_dir, "documents")
    ids = [
        str(r[0])
        for r in docs.filter(
            F.col("source").isin(*NEW_SOURCES)
            & (F.pmod(F.col("doc_id"), F.lit(23)) == 0)
        )
        .select("doc_id")
        .collect()  # bounded: |batch docs| / 23
    ]
    t = ingested_index_tables(spark, sf_dir)
    ana = spark.read.parquet(os.path.join(t["warehouse"], ANALYTICS_TABLE))
    return (
        ana.filter(
            F.col("message_id").isin(ids)
            & F.col("project_code").isin(*NEW_SOURCES)
        )
        .select(
            F.col("message_id").cast("long").alias("doc_id"),
            F.col("project_code").alias("source"),
            F.length("message_text").cast("long").alias("n_chars_stored"),
        )
        .orderBy("doc_id")
    )
