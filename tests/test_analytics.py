"""The MV-cascade transforms (SURVEY.md §2.3-2.5): message->raw, union,
analytics projection (init.sql:100-121 semantics)."""

from __future__ import annotations

import datetime as dt

from go_nats_to_clickhouse_spark.operators.analytics import (
    SUBJECT_SEGMENTS,
    analytics_projection,
    message_to_raw,
    union_all_streams,
)
from go_nats_to_clickhouse_spark.schemas import ANALYTICS_SCHEMA, MESSAGE_SCHEMA

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _msg_df(spark, rows):
    return spark.createDataFrame(rows, MESSAGE_SCHEMA)


def test_message_to_raw_columns_and_chat_id(spark):
    df = _msg_df(
        spark,
        [(TS, "globex.supprt.u1.chat9.evt", 7, '{"m":1}', '{"text":"hi"}')],
    )
    row = message_to_raw(df).first()
    assert row["chat_id"] == "chat9"
    assert row["sequence"] == 7
    assert row["subject"] == "globex.supprt.u1.chat9.evt"
    assert list(message_to_raw(df).columns) == [
        "timestamp",
        "subject",
        "chat_id",
        "sequence",
        "metadata",
        "data",
    ]


def test_message_to_raw_null_metadata_defaults_to_empty_object(spark):
    # ref main.go:168-172: marshal failure falls back to "{}"
    df = _msg_df(spark, [(TS, "a.b.c.d", 1, None, "{}")])
    assert message_to_raw(df).first()["metadata"] == "{}"


def test_analytics_projection_full_subject(spark):
    subj = "cli.proj.user.sess.from.to.type.ctx"
    data = '{"text":"T","meta":"M","id":"I","timestamp":1700000000}'
    df = message_to_raw(_msg_df(spark, [(TS, subj, 1, "{}", data)]))
    row = analytics_projection(df).first()
    assert [row[s] for s in SUBJECT_SEGMENTS] == [
        "cli",
        "proj",
        "user",
        "sess",
        "from",
        "to",
        "type",
        "ctx",
    ]
    assert row["message_text"] == "T"
    assert row["message_meta"] == "M"
    assert row["message_id"] == "I"
    assert row["message_timestamp"] == dt.datetime.fromtimestamp(
        1700000000, dt.timezone.utc
    ).replace(tzinfo=None)


def test_analytics_projection_short_subject_defaults(spark):
    df = message_to_raw(_msg_df(spark, [(TS, "a.b", 1, "{}", "{}")]))
    row = analytics_projection(df).first()
    assert row["client_code"] == "a"
    assert row["project_code"] == "b"
    assert all(row[s] == "" for s in SUBJECT_SEGMENTS[2:])
    # missing json keys -> '' strings, timestamp 0 -> epoch (ClickHouse default)
    assert row["message_text"] == ""
    assert row["message_timestamp"] == dt.datetime(1970, 1, 1)


def test_analytics_projection_schema_matches_registry(spark):
    df = message_to_raw(_msg_df(spark, [(TS, "a.b.c.d", 1, "{}", "{}")]))
    out = analytics_projection(df)
    assert [f.name for f in out.schema.fields] == [f.name for f in ANALYTICS_SCHEMA.fields]


def test_union_all_streams_bag_semantics(spark):
    df = message_to_raw(_msg_df(spark, [(TS, "a.b.c.d", 1, "{}", "{}")]))
    assert union_all_streams(df, df).count() == 2  # no dedup (UNION ALL)
