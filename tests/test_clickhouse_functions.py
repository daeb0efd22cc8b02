"""ClickHouse edge-semantics wrappers (SURVEY.md §2.4) — the invariants the
reference relies on: 1-based split indexing with '' default, JSON extraction
defaults, chat-id extraction with <4-segment guard (main.go:173-183)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.functions.clickhouse import (
    ch_json_extract_string,
    ch_json_extract_uint,
    ch_split_element,
    chat_id_from_subject,
    to_yyyymm,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_split_element_basic(spark):
    c = ch_split_element(F.lit("a.b.c.d"), 2)
    assert _one(spark, c) == "b"


def test_split_element_out_of_range_returns_empty(spark):
    assert _one(spark, ch_split_element(F.lit("a.b"), 5)) == ""


def test_split_element_null_input_returns_empty(spark):
    assert _one(spark, ch_split_element(F.lit(None).cast("string"), 1)) == ""


def test_split_element_empty_string(spark):
    # ClickHouse: splitByChar('.', '') = [''] -> element 1 is ''
    assert _one(spark, ch_split_element(F.lit(""), 1)) == ""


def test_split_element_is_one_based(spark):
    assert _one(spark, ch_split_element(F.lit("x.y"), 1)) == "x"


def test_chat_id_fourth_segment(spark):
    subj = "globex.supprt.user42.chat-7.msg"
    assert _one(spark, chat_id_from_subject(F.lit(subj))) == "chat-7"


def test_chat_id_short_subject_empty(spark):
    assert _one(spark, chat_id_from_subject(F.lit("a.b.c"))) == ""


def test_json_extract_string(spark):
    j = '{"text": "hello", "n": 5}'
    assert _one(spark, ch_json_extract_string(F.lit(j), "text")) == "hello"


def test_json_extract_string_missing_key(spark):
    assert _one(spark, ch_json_extract_string(F.lit("{}"), "text")) == ""


def test_json_extract_string_malformed(spark):
    assert _one(spark, ch_json_extract_string(F.lit("not json"), "text")) == ""


def test_json_extract_string_non_string_values_empty(spark):
    # ClickHouse JSONExtractString returns '' for non-string JSON values
    # (number/object/array/bool/null) — not their JSON text (ADVICE r1).
    for payload in (
        '{"text": 42}',
        '{"text": {"a": 1}}',
        '{"text": [1, 2]}',
        '{"text": true}',
        '{"text": null}',
    ):
        assert _one(spark, ch_json_extract_string(F.lit(payload), "text")) == ""
    # a string that LOOKS numeric is still a string
    assert _one(spark, ch_json_extract_string(F.lit('{"text": "42"}'), "text")) == "42"


def test_json_extract_uint(spark):
    assert _one(spark, ch_json_extract_uint(F.lit('{"timestamp": 1700000000}'), "timestamp")) == 1700000000


def test_json_extract_uint_missing_is_zero(spark):
    assert _one(spark, ch_json_extract_uint(F.lit("{}"), "timestamp")) == 0


def test_json_extract_uint_non_numeric_is_zero(spark):
    assert _one(spark, ch_json_extract_uint(F.lit('{"timestamp": "abc"}'), "timestamp")) == 0


def test_to_yyyymm(spark):
    assert _one(spark, to_yyyymm(F.lit("2024-03-15 10:00:00").cast("timestamp"))) == 202403
