"""Query registry: every operator from SURVEY.md §2 (plus the §2.7 query
surface and the LLM-pipeline extensions) as a named (spark, sf_dir) ->
DataFrame callable with a DuckDB oracle SQL string alongside.

Import side effect: importing this package registers all queries.
"""

from go_nats_to_clickhouse_spark.queries.registry import ORACLES, QUERIES

# Register everything (order matters only for readability of listings).
from go_nats_to_clickhouse_spark.queries import (  # noqa: E402,F401
    behavioral,
    clickhouse_aggs,
    multimodal,
    reference,
    relational,
    subqueries,
    text,
    tpch_extra,
    vector,
)

__all__ = ["QUERIES", "ORACLES"]
