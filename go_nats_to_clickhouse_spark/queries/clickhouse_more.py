"""More ClickHouse function-family analogs: moving aggregates, deltaSum,
histogram, URL functions, minMap/maxMap.

Users of the reference query its ClickHouse tables (init.sql:74-112) with
these families; each is re-expressed as a portable single- or zero-shuffle
Spark plan with the same determinism discipline as queries/clickhouse_aggs.py
(composite unique orderings, exact decimal arithmetic for float sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

#: exact decimal for event values (testdata values have <= 6 fractional digits)
VAL_DEC = "decimal(24,6)"


@query(
    "agg_moving_avg",
    """
WITH w AS (
  SELECT user_id, event_id,
         SUM(CAST(value AS DECIMAL(24,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
         ) AS s,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
         ) AS n
  FROM events
)
SELECT user_id, event_id, ROUND(CAST(s AS DOUBLE) / n, 6) AS mov_avg3
FROM w
ORDER BY user_id, event_id
""",
)
def agg_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArrayMovingAvg(3)(value)`` analog: per-user moving
    average over the last 3 events, ordered by the composite unique key
    (ts, event_id).

    Instead of materializing a per-group array (ClickHouse's spelling,
    which caps at group cardinality), the Spark-first form is a windowed
    frame aggregate — one shuffle on user_id, frames evaluated inside
    codegen, output streamed row-by-row so a 100 TB events table never
    builds giant in-memory arrays. The sum is exact decimal, divided once
    in IEEE double — bit-identical across engines.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    s = F.sum(F.col("value").cast(VAL_DEC)).over(w)
    n = F.count(F.lit(1)).over(w)
    return (
        events.select(
            "user_id",
            "event_id",
            F.round(s.cast("double") / n, 6).alias("mov_avg3"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "agg_delta_sum",
    """
WITH d AS (
  SELECT user_id,
         CAST(value AS DECIMAL(24,6))
           - lag(CAST(value AS DECIMAL(24,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS delta
  FROM events
)
SELECT user_id,
       ROUND(CAST(COALESCE(SUM(CASE WHEN delta > 0 THEN delta END), 0)
             AS DOUBLE), 6) AS delta_sum,
       CAST(COUNT(CASE WHEN delta > 0 THEN 1 END) AS BIGINT) AS n_increases
FROM d
GROUP BY user_id
ORDER BY user_id
""",
)
def agg_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum(value)`` analog: per user, the sum of positive
    deltas between consecutive event values in (ts, event_id) order — the
    standard counter-reset-tolerant rate primitive.

    One shuffle on user_id serves both the lag window and the final
    aggregate (Catalyst reuses the partitioning); deltas accumulate in
    exact decimal so the engines agree bit-for-bit.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value").cast(VAL_DEC)
    d = events.select(
        "user_id", (v - F.lag(v).over(w)).alias("delta")
    )
    pos = F.when(F.col("delta") > 0, F.col("delta"))
    return (
        d.groupBy("user_id")
        .agg(
            F.round(F.coalesce(F.sum(pos), F.lit(0).cast(VAL_DEC)).cast("double"), 6)
            .alias("delta_sum"),
            F.count(pos).alias("n_increases"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_histogram",
    """
SELECT CAST(floor(p_retailprice / 100) * 100 AS BIGINT) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(p_retailprice), 2) AS bin_min,
       ROUND(MAX(p_retailprice), 2) AS bin_max
FROM part
GROUP BY 1
ORDER BY bin_lo
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``histogram(N)(x)`` analog with fixed-width bins (width
    100 over retail price). ClickHouse's adaptive-bin histogram is
    nondeterministic by design (bin edges depend on merge order); the
    fixed-width spelling keeps the same product — a distribution sketch —
    while staying engine-portable and exactly checkable.

    Map-side: the bin key is computed in the scan projection, so the
    shuffle carries (bin, partial aggregates) only — at 100 TB this is a
    classic low-cardinality hash aggregate, ~200 groups regardless of input
    size.
    """
    part = load_table(spark, sf_dir, "part")
    bin_lo = (F.floor(F.col("p_retailprice") / 100) * 100).cast("bigint")
    return (
        part.groupBy(bin_lo.alias("bin_lo"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p_retailprice"), 2).alias("bin_min"),
            F.round(F.max("p_retailprice"), 2).alias("bin_max"),
        )
        .orderBy("bin_lo")
    )


@query(
    "scalar_url_functions",
    """
WITH u AS (
  SELECT doc_id,
         concat('https://', source, '.example.org/docs/', doc_id,
                '?lang=', lang, '&ref=home') AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
       regexp_extract(regexp_extract(url, '^https?://([^/?#]+)', 1),
                      '([^.]+\\.[^.]+)$', 1) AS domain,
       regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
       regexp_extract(url, '^([a-z]+):', 1) AS protocol
FROM u
ORDER BY doc_id
""",
)
def scalar_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL function family (``domain``, ``topLevelDomain``-ish,
    ``path``, ``extractURLParameter``, ``protocol``) over a URL synthesized
    from document metadata.

    Spark-first: ``parse_url`` is the built-in JVM URL parser (HOST / PATH
    / QUERY:key / PROTOCOL forms); only the registrable-domain suffix falls
    back to a regexp. All map-side codegen — zero shuffles, and the oracle
    proves parse_url agrees with a from-scratch regexp decomposition.
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=home"),
    )
    u = d.select("doc_id", url.alias("url"))
    return (
        u.select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.regexp_extract(
                F.parse_url("url", F.lit("HOST")), r"([^.]+\.[^.]+)$", 1
            ).alias("domain"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
            F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("protocol"),
        )
        .orderBy("doc_id")
    )


@query(
    "agg_min_max_map",
    """
SELECT event_type,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k,
       CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_min_max_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap``/``maxMap`` analog: key-wise min/max over the
    semi-structured ``props`` payload, completing the sumMap family
    (queries/clickhouse_aggs.py agg_sum_map_props).

    Same scale shape as sumMap: JSON extraction happens in the map-stage
    projection, so only (event_type, partial min/max) cross the shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.count(k).alias("n_with_k"),
        )
        .orderBy("event_type")
    )
