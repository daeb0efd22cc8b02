"""Reference-parity queries: the NATS->raw->union->analytics cascade
(SURVEY.md §2.1-2.6) exercised as oracle-checkable batch queries.

The driver's fixtures have no NATS stream, so the ``events`` table is
deterministically mapped to message envelopes (subject + JSON payload) with
*identical* expressions on the Spark side and in the DuckDB oracle; the
engine's actual cascade operators (``message_to_raw``,
``analytics_projection``, ``union_all_streams``) then run on top. This
checks the exact ClickHouse edge semantics of init.sql:100-121 (1-based
split with '' default, JSONExtract defaults, epoch->DateTime) end to end.

Subject layout mirrors nats.yml:8-10 (``globex.<stream>.>``): error events
get a 5-segment subject (exercising out-of-range defaults), everything else
8 segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.functions.clickhouse import ch_split_element, to_yyyymm
from go_nats_to_clickhouse_spark.operators.analytics import (
    analytics_projection,
    message_to_raw,
    union_all_streams,
)
from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

# ---------------------------------------------------------------------------
# events -> message envelopes (identical construction in Spark and SQL)
# ---------------------------------------------------------------------------


def events_as_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Widen the input splits FIRST (events.parquet is one file = 1-2 splits
    # at test scale, which would serialize every downstream JSON parse on
    # one task — measured 1.25 s -> 0.8 s on the flagship at sf0.1; same
    # fix as dedup.word_shingles). At 100 TB the reader already produces
    # thousands of splits and this is a cheap round-robin of narrow rows.
    e = load_table(spark, sf_dir, "events")
    e = e.repartition(spark.sparkContext.defaultParallelism)
    uid = F.col("user_id").cast("string")
    eid = F.col("event_id").cast("string")
    stream = F.when(F.col("user_id") % 2 == 0, F.lit("supprt")).otherwise(
        F.lit("crmabc")
    )
    base = F.concat_ws(
        ".",
        F.lit("globex"),
        stream,
        F.concat(F.lit("u"), uid),
        F.concat(F.lit("chat-"), (F.col("user_id") % 97).cast("string")),
        F.col("event_type"),
    )
    tail = F.concat(
        F.lit(".dst"),
        (F.col("event_id") % 2).cast("string"),
        F.lit(".t"),
        (F.col("event_id") % 3).cast("string"),
        F.lit(".ctx"),
        (F.col("event_id") % 7).cast("string"),
    )
    subject = F.when(F.col("event_type") == "error", base).otherwise(
        F.concat(base, tail)
    )
    epoch_s = F.unix_timestamp(F.col("ts")).cast("string")
    data = F.concat(
        F.lit('{"text":"'),
        F.col("event_type"),
        F.lit("-"),
        eid,
        F.lit('","meta":"m'),
        (F.col("event_id") % 5).cast("string"),
        F.lit('","id":"'),
        eid,
        F.lit('","timestamp":'),
        epoch_s,
        F.lit("}"),
    )
    metadata = F.concat(F.lit('{"seq":'), eid, F.lit("}"))
    return e.select(
        F.col("ts").alias("timestamp"),
        subject.alias("subject"),
        F.col("event_id").alias("sequence"),
        metadata.alias("metadata"),
        data.alias("data"),
    )


#: the same construction as ANSI SQL (DuckDB), used as a CTE by every oracle
MESSAGES_CTE = """
messages AS (
  SELECT
    ts AS timestamp,
    'globex.' || (CASE WHEN user_id % 2 = 0 THEN 'supprt' ELSE 'crmabc' END)
      || '.u' || CAST(user_id AS VARCHAR)
      || '.chat-' || CAST(user_id % 97 AS VARCHAR)
      || '.' || event_type
      || (CASE WHEN event_type = 'error' THEN ''
          ELSE '.dst' || CAST(event_id % 2 AS VARCHAR)
            || '.t' || CAST(event_id % 3 AS VARCHAR)
            || '.ctx' || CAST(event_id % 7 AS VARCHAR) END) AS subject,
    event_id AS sequence,
    '{"seq":' || CAST(event_id AS VARCHAR) || '}' AS metadata,
    '{"text":"' || event_type || '-' || CAST(event_id AS VARCHAR)
      || '","meta":"m' || CAST(event_id % 5 AS VARCHAR)
      || '","id":"' || CAST(event_id AS VARCHAR)
      || '","timestamp":' || CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR)
      || '}' AS data
  FROM events
)
"""

RAW_CTE = """
raw AS (
  SELECT timestamp, subject,
         coalesce(string_split(subject, '.')[4], '') AS chat_id,
         sequence, metadata, data
  FROM messages
)
"""

_SEG_SQL = ",\n  ".join(
    f"coalesce(string_split(subject, '.')[{i + 1}], '') AS {name}"
    for i, name in enumerate(
        (
            "client_code",
            "project_code",
            "user_id",
            "session_id",
            "message_from",
            "message_to",
            "message_type",
            "message_context",
        )
    )
)

MV_ANALYTICS_ORACLE = f"""
WITH {MESSAGES_CTE}, {RAW_CTE}
SELECT
  timestamp, subject, chat_id, metadata, data,
  CASE WHEN json_type(data, '$.text') = 'VARCHAR'
       THEN json_extract_string(data, '$.text') ELSE '' END AS message_text,
  CASE WHEN json_type(data, '$.meta') = 'VARCHAR'
       THEN json_extract_string(data, '$.meta') ELSE '' END AS message_meta,
  CASE WHEN json_type(data, '$.id') = 'VARCHAR'
       THEN json_extract_string(data, '$.id') ELSE '' END AS message_id,
  make_timestamp(coalesce(TRY_CAST(json_extract_string(data, '$.timestamp') AS BIGINT), 0) * 1000000) AS message_timestamp,
  {_SEG_SQL}
FROM raw
"""


@query("mv_analytics_projection", MV_ANALYTICS_ORACLE)
def mv_analytics_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operators P1-P4 + F1-F7 (init.sql:100-121 + main.go:160-192):
    full ingest transform + MV projection, 17 columns.

    Served through the parse-once VariantType path (F7 fidelity — the
    ClickHouse JSON-column behavior): ``data`` is parsed into a shredded
    variant ONCE and every extraction is a typed get, ~20% faster than
    re-deriving each path from text and pinned bit-identical to the
    string-based projection by
    tests/test_variant.py::test_projection_variant_matches_string_path."""
    from go_nats_to_clickhouse_spark.operators.variant import (
        analytics_projection_variant,
        variant_supported,
    )

    raw = message_to_raw(events_as_messages(spark, sf_dir))
    if variant_supported(spark):
        return analytics_projection_variant(raw)
    return analytics_projection(raw)  # pre-VariantType Spark fallback


@query(
    "mv_union_streams_monthly",
    f"""
WITH {MESSAGES_CTE}, {RAW_CTE}
SELECT string_split(subject, '.')[2] AS stream,
       CAST(year(timestamp) * 100 + month(timestamp) AS INT) AS ym,
       count(*) AS n,
       CAST(max(sequence) AS BIGINT) AS max_seq
FROM raw
GROUP BY 1, 2
""",
)
def mv_union_streams_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operators U1/U2 + the monthly partition key (init.sql:18,49-71):
    per-stream fan-in, then count per stream x toYYYYMM partition."""
    raw = message_to_raw(events_as_messages(spark, sf_dir))
    stream_col = ch_split_element("subject", 2)
    supprt = raw.filter(stream_col == "supprt")
    crmabc = raw.filter(stream_col == "crmabc")
    unioned = union_all_streams(supprt, crmabc)
    return (
        unioned.withColumn("stream", stream_col)
        .withColumn("ym", to_yyyymm("timestamp"))
        .groupBy("stream", "ym")
        .agg(F.count(F.lit(1)).alias("n"), F.max("sequence").alias("max_seq"))
    )


@query(
    "mv_message_type_stats",
    f"""
WITH {MESSAGES_CTE}, {RAW_CTE}
SELECT
  coalesce(string_split(subject, '.')[7], '') AS message_type,
  coalesce(string_split(subject, '.')[2], '') AS project_code,
  count(*) AS n,
  count(DISTINCT coalesce(string_split(subject, '.')[3], '')) AS n_users
FROM raw
GROUP BY 1, 2
""",
)
def mv_message_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over MV-derived columns — including the ''-defaulted
    out-of-range segments of short (error) subjects."""
    a = analytics_projection(message_to_raw(events_as_messages(spark, sf_dir)))
    return a.groupBy("message_type", "project_code").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )
