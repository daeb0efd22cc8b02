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


def test_variant_capability_gate(spark):
    from go_nats_to_clickhouse_spark.operators.variant import variant_supported

    assert variant_supported(spark)  # Spark 4: the gate is open here


def test_projection_variant_matches_string_path(spark):
    """F7 fidelity (VERDICT r4 #8): the parse-once VariantType projection
    must be bit-identical to the string-based MV projection on the same
    raw rows — including the ''-for-non-string JSONExtractString rule,
    the 0-default DateTime, and malformed payloads."""
    from go_nats_to_clickhouse_spark.operators.variant import (
        analytics_projection_variant,
    )

    rows = [
        (
            TS,
            f"acme.chat.u{i}.c{i}.a.b.t.x",
            i,
            f'{{"seq":{i}}}',
            f'{{"text":"hi-{i}","meta":"m{i}","id":"id{i}",'
            f'"timestamp":{1700000000 + i}}}',
        )
        for i in range(5)
    ] + [
        # JSONExtractString '' rule: numeric/object/array/bool values
        (TS, "a.b.u.c", 90, "{}", '{"text":7,"meta":{"k":1},"id":[1],"timestamp":"177"}'),
        # malformed payload
        (TS, "a.b.u.c", 91, "{}", "not valid json"),
        # missing keys entirely
        (TS, "a.b.u.c", 92, "{}", "{}"),
        # non-numeric timestamp -> 0 -> epoch
        (TS, "a.b.u.c", 93, "{}", '{"timestamp":"zzz"}'),
    ]
    raw = message_to_raw(spark.createDataFrame(rows, MESSAGE_SCHEMA))
    a = analytics_projection(raw).orderBy("data").collect()
    b = analytics_projection_variant(raw).orderBy("data").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_variant_roundtrip(spark):
    from go_nats_to_clickhouse_spark.operators.variant import variant_roundtrip

    df = spark.createDataFrame(
        [
            (1, '{"b": 2, "a": [1, 2, {"x": null}]}'),
            (2, "not json"),
            (3, None),
            (4, '{"nested": {"deep": {"v": 1.5}}}'),
        ],
        "id long, payload string",
    )
    out = {r.id: r for r in variant_roundtrip(df, "payload").collect()}
    import json

    # valid JSON survives the trip semantically (canonicalized text)
    assert json.loads(out[1].payload_json) == json.loads(df.collect()[0].payload)
    assert json.loads(out[4].payload_json) == {"nested": {"deep": {"v": 1.5}}}
    # malformed / NULL -> NULL variant -> NULL serialization, no errors
    assert out[2].payload_json is None
    assert out[3].payload_json is None
