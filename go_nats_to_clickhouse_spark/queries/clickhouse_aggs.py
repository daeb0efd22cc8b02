"""ClickHouse parametric/combinator aggregate analogs over the events stream.

The reference sinks into ClickHouse (init.sql:74-96), whose users lean on a
family of aggregates Spark spells differently: ``argMax``/``argMin``,
``groupArray``/``groupUniqArray``, ``sumMap`` and ``sequenceMatch``. Each is
re-expressed as a portable single-shuffle relational plan: the Spark side uses
the built-in JVM aggregate (``max_by``/``min_by``, ``collect_set``,
conditional sums), never a Python UDF, so every one stays inside whole-stage
codegen and map-side partial aggregation does the heavy lifting before the
one user_id/key shuffle.

Determinism across engines: ``argMax`` ties are broken by a composite
ordering struct (ts, event_id) — event_id is unique, so the winner is unique
regardless of engine or partitioning; ``groupArray`` output is sorted (raw
collect order is partition-dependent in any distributed engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table


@query(
    "agg_argmax_latest_event",
    """
WITH ranked AS (
  SELECT user_id, event_type, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn_last,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS rn_first
  FROM events
),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM events
  GROUP BY user_id
)
SELECT a.user_id,
       l.event_type AS last_event_type,
       ROUND(l.value, 6) AS last_value,
       f.event_type AS first_event_type,
       a.n_events
FROM agg a
JOIN ranked l ON l.user_id = a.user_id AND l.rn_last = 1
JOIN ranked f ON f.user_id = a.user_id AND f.rn_first = 1
ORDER BY a.user_id
""",
)
def agg_argmax_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMax(event_type, ts)`` / ``argMin`` analog: per user,
    the type+value of their latest event and the type of their earliest.

    Spark-first plan: ``max_by``/``min_by`` keyed by a composite ordering
    struct ``(ts, event_id)`` — one hash aggregate with map-side partials,
    no window, no second shuffle (the DuckDB oracle uses the windowed
    row_number form instead; same rows, different physical strategy —
    exactly the flexibility argMax exists to provide).
    """
    events = load_table(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by(F.col("event_type"), ordk).alias("last_event_type"),
            F.round(F.max_by(F.col("value"), ordk), 6).alias("last_value"),
            F.min_by(F.col("event_type"), ordk).alias("first_event_type"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
        .select(
            "user_id",
            "last_event_type",
            "last_value",
            "first_event_type",
            "n_events",
        )
    )


@query(
    "agg_group_array_types",
    """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
       CAST(len(list(DISTINCT event_type)) AS INT) AS n_types
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def agg_group_array_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupUniqArray(event_type)`` analog: the distinct event
    types each user produced, as a sorted array (emitted comma-joined so the
    result is a scalar column — raw array cells are unhashable for
    cross-engine comparison harnesses).

    ``collect_set`` is the JVM-side set-union aggregate (map-side partial
    sets merge in the shuffle); the explicit ``array_sort`` is what makes
    the result well-defined — raw collect order is partition-order-dependent
    in every distributed engine, so an unsorted groupArray can never be
    hash-compared or relied on downstream.
    """
    events = load_table(spark, sf_dir, "events")
    types = F.array_join(F.array_sort(F.collect_set("event_type")), ",")
    return (
        events.groupBy("user_id")
        .agg(
            types.alias("event_types"),
            F.size(F.collect_set("event_type")).alias("n_types"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_sum_map_props",
    """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_sum_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap`` flavor: key-wise aggregation over the
    semi-structured ``props`` JSON payload (the reference stores payloads as
    opaque strings and extracts lazily, init.sql:79-80 / init.sql:109-112).

    ``get_json_object`` runs JVM-side inside codegen; the extraction happens
    in the map stage so only (event_type, partial sums) cross the shuffle —
    at 100 TB the JSON strings themselves never move.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count(k).alias("n_with_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_uniq_up_to",
    """
SELECT event_type,
       CAST(least(count(DISTINCT user_id), 11) AS BIGINT) AS uniq_users_up_to_10,
       CAST(count(DISTINCT user_id) <= 10 AS BOOLEAN) AS is_exact
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_uniq_up_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(10)(user_id)`` analog: exact distinct count
    while it is <= N, the sentinel N+1 once it exceeds it ("more than N").

    ClickHouse implements this with a bounded hash set per group; on Spark
    the declarative spelling ``least(count_distinct, N+1)`` gives Catalyst
    the same bound-awareness opportunity while staying a plain two-phase
    distinct aggregate — partial distinct sets merge map-side, and only
    group keys + partial sets cross the shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    n = 10
    d = F.count_distinct(F.col("user_id"))
    return (
        events.groupBy("event_type")
        .agg(
            F.least(d, F.lit(n + 1)).alias("uniq_users_up_to_10"),
            (d <= n).alias("is_exact"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_sequence_match",
    """
SELECT user_id,
       CAST(min(CASE WHEN event_type = 'view' THEN ts END)
              < max(CASE WHEN event_type = 'purchase' THEN ts END)
            AS BOOLEAN) AS matched
FROM events
GROUP BY user_id
HAVING count(CASE WHEN event_type IN ('view', 'purchase') THEN 1 END) > 0
ORDER BY user_id
""",
)
def agg_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)')(ts, view, purchase)``
    analog: did the user ever view and then (strictly later) purchase?

    For the two-step any-gap pattern the full NFA is unnecessary:
    ``min(view ts) < max(purchase ts)`` is equivalent and collapses to one
    conditional-aggregate pass — two partial aggregates per user cross the
    shuffle instead of the user's whole event history (the deepest-chain
    variant with a time bound lives in ``funnel_conversion``).
    """
    events = load_table(spark, sf_dir, "events")
    vts = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    pts = F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
    seen = F.count(
        F.when(F.col("event_type").isin("view", "purchase"), F.lit(1))
    )
    return (
        events.groupBy("user_id")
        .agg((vts < pts).alias("matched"), seen.alias("_seen"))
        .where(F.col("_seen") > 0)
        .drop("_seen")
        .orderBy("user_id")
    )
