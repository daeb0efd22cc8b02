"""Wire-envelope parsing (README.md:18-30 shape) + file stand-in source."""

from __future__ import annotations

import json

from go_nats_to_clickhouse_spark.sources.envelope import (
    message_file_batch,
    message_file_stream,
    parse_envelope,
)


def _env_line(seq, subject="globex.supprt.u1.chat-1.msg", text="hi"):
    return json.dumps(
        {
            "metadata": json.dumps({"timestamp": 1709294400 + seq, "sequence": seq}),
            "subject": subject,
            "data": json.dumps({"text": text, "value": 42}),
        }
    )


def test_parse_envelope_extracts_message_columns(spark):
    df = spark.createDataFrame([(_env_line(7),)], "value string")
    row = parse_envelope(df).first()
    assert row["subject"] == "globex.supprt.u1.chat-1.msg"
    assert row["sequence"] == 7
    assert row["timestamp"].year == 2024
    assert json.loads(row["data"])["value"] == 42


def test_parse_envelope_malformed_is_null_not_crash(spark):
    df = spark.createDataFrame([("not json at all",)], "value string")
    row = parse_envelope(df).first()
    assert row["subject"] is None  # -> dead letter downstream, never a crash
    assert row["metadata"] == "{}"


def test_file_batch_roundtrip(spark, tmp_path):
    p = tmp_path / "msgs"
    p.mkdir()
    (p / "part1.jsonl").write_text(
        "\n".join(_env_line(i) for i in range(5)), encoding="utf-8"
    )
    df = message_file_batch(spark, str(p))
    assert df.count() == 5
    assert sorted(r["sequence"] for r in df.collect()) == list(range(5))


def test_file_stream_feeds_pipeline_cascade(spark, tmp_path):
    from go_nats_to_clickhouse_spark.streaming.pipeline import (
        ANALYTICS_TABLE,
        PipelineTables,
    )

    p = tmp_path / "msgs2"
    p.mkdir()
    (p / "a.jsonl").write_text(
        "\n".join(_env_line(i) for i in range(6)), encoding="utf-8"
    )
    src = message_file_stream(spark, str(p))
    assert src.isStreaming
    from go_nats_to_clickhouse_spark.streaming.pipeline import apply_cascade

    tables = PipelineTables(str(tmp_path / "wh_env"))
    q = (
        src.writeStream.foreachBatch(lambda b, _id: apply_cascade(b, tables))
        .option("checkpointLocation", str(tmp_path / "ckpt_env"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ana = spark.read.parquet(tables.path(ANALYTICS_TABLE))
    assert ana.count() == 6
    assert ana.first()["client_code"] == "globex"
