"""VariantType layer: parse-once semi-structured columns must agree with
the string-based (get_json_object) extraction the MV cascade uses."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.analytics import (
    analytics_projection,
    message_to_raw,
)
from go_nats_to_clickhouse_spark.operators.variant import (
    analytics_with_variant,
    variant_extract_demo,
)
from go_nats_to_clickhouse_spark.schemas import MESSAGE_SCHEMA

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _analytics(spark):
    rows = [
        (
            TS,
            f"globex.supprt.u{i}.c{i}.t",
            i,
            f'{{"seq":{i}}}',
            f'{{"text":"hi-{i}","timestamp":{1700000000 + i}}}',
        )
        for i in range(10)
    ] + [(TS, "globex.supprt.u99.c99.bad", 99, "{}", "not valid json")]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    return analytics_projection(message_to_raw(df))


def test_variant_matches_string_extraction(spark):
    ana = _analytics(spark)
    v = variant_extract_demo(analytics_with_variant(ana))
    rows = {r["subject"]: r for r in v.collect()}
    base = {r["subject"]: r for r in ana.collect()}
    for subj, r in rows.items():
        expected_text = base[subj]["message_text"]
        if r["text_v"] is None:
            assert expected_text == ""  # malformed payload -> '' in MV, NULL variant
        else:
            assert r["text_v"] == expected_text


def test_malformed_json_is_null_variant_not_error(spark):
    ana = _analytics(spark)
    v = analytics_with_variant(ana)
    bad = v.filter(F.col("data") == "not valid json").first()
    assert bad["data_v"] is None  # try_parse_json swallows, batch survives


def test_variant_typed_access(spark):
    ana = _analytics(spark)
    v = variant_extract_demo(analytics_with_variant(ana))
    ok = v.filter(F.col("ts_v").isNotNull()).collect()
    assert len(ok) == 10
    assert all(isinstance(r["ts_v"], int) and r["ts_v"] >= 1700000000 for r in ok)
    assert all(isinstance(r["seq_v"], int) for r in ok)
