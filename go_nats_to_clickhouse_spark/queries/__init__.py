"""Query registry: every operator from SURVEY.md §2 (plus the §2.7 query
surface and the LLM-pipeline extensions) as a named (spark, sf_dir) ->
DataFrame callable with a DuckDB oracle SQL string alongside.

Import side effect: importing this package registers all queries.
"""

from go_nats_to_clickhouse_spark.queries.registry import ORACLES, QUERIES

# Registration order = queries() dict order = the order any budgeted
# correctness harness walks. Modules whose queries lack a driver-checked
# row from round 1 come FIRST so a capped run verifies them before
# re-verifying the already-green set (CORRECTNESS_r01 covered the first 50
# registrations and nothing after).
from go_nats_to_clickhouse_spark.queries import clickhouse_r10  # noqa: E402

# Round-11 activation of the four round-10 stats analogs (deferred one
# round so they would not displace the r3/r4 rotation-debt cohort from
# the driver's 50-slot sample window — see clickhouse_r10's module
# docstring). Registered FIRST: never-driver-sampled rows lead.
clickhouse_r10.register()

# Round-12 activation of the gram-lifecycle rows deferred from round 11
# (erased/appended/erased-appended/streamed span reads) plus the new
# compacted cell — see queries/text_r11.py's module docstring. Same
# never-sampled-rows-lead placement as the r10 activation above.
from go_nats_to_clickhouse_spark.queries import text_r11  # noqa: E402

text_r11.register()

from go_nats_to_clickhouse_spark.queries import (  # noqa: E402,F401
    clickhouse_r11,
    clickhouse_r9,
    clickhouse_r8,
    clickhouse_r8b,
    clickhouse_r7,
    retrieval,
    pipeline_mat,
    clickhouse_r5,
    clickhouse_r4,
    clickhouse_r3,
    pipeline_extra,
    clickhouse_more,
    stats,
    text,
    tpch_extra,
    vector,
    multimodal,
    streaming,
    subqueries,
    behavioral,
    clickhouse_aggs,
    reference,
    relational,
)

__all__ = ["QUERIES", "ORACLES"]
