"""Micro-batch pipeline tests (SURVEY.md §2.2, §2.6, §3.1-3.2): the
raw -> union -> analytics cascade, dead-letter handling, graceful stop,
checkpointed at-least-once restart."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from go_nats_to_clickhouse_spark.config import EngineConfig
from go_nats_to_clickhouse_spark.schemas import MESSAGE_SCHEMA
from go_nats_to_clickhouse_spark.sources.nats import (
    JsMessage,
    NatsDataSource,
    write_replay_file,
)
from go_nats_to_clickhouse_spark.streaming.pipeline import (
    ALL_STREAMS_TABLE,
    ANALYTICS_TABLE,
    DEAD_LETTER_TABLE,
    PipelineTables,
    apply_cascade,
    start_pipeline,
    stop_gracefully,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 0)
BASE_US = int(TS.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)


def _messages(n):
    return [
        JsMessage(
            subject=(
                f"globex.{'supprt' if i % 2 == 0 else 'crmabc'}"
                f".u{i % 5}.chat-{i % 3}.click.dst0.t1.ctx{i % 7}"
            ),
            data=f'{{"text":"hi-{i}","meta":"m","id":"{i}","timestamp":1709294400}}',
            sequence=i + 1,
            timestamp_us=BASE_US + i * 1000,
        )
        for i in range(n)
    ]


def _run_pipeline(spark, tmp_path, msgs, max_per_trigger=100, name="t"):
    replay = tmp_path / f"replay_{name}.jsonl"
    if not replay.exists():
        write_replay_file(str(replay), msgs)
    spark.dataSource.register(NatsDataSource)
    cfg = EngineConfig(
        warehouse_dir=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        batch_timeout_seconds=1,
    )
    src = (
        spark.readStream.format("nats-jetstream")
        .option("replayFile", str(replay))
        .option("subjects", "globex.>")
        .option("maxRecordsPerTrigger", max_per_trigger)
        .load()
    )
    q = start_pipeline(spark, cfg, src, query_name=f"test-ingest-{name}")
    stop_gracefully(q)
    return cfg


class TestCascade:
    def test_three_tables_written(self, spark, tmp_path):
        cfg = _run_pipeline(spark, tmp_path, _messages(50), name="cascade")
        raw = spark.read.parquet(os.path.join(cfg.warehouse_dir, "nats_data_stream"))
        alls = spark.read.parquet(os.path.join(cfg.warehouse_dir, ALL_STREAMS_TABLE))
        ana = spark.read.parquet(os.path.join(cfg.warehouse_dir, ANALYTICS_TABLE))
        assert raw.count() == alls.count() == ana.count() == 50

    def test_raw_routed_per_stream(self, spark, tmp_path):
        # fixes reference quirk K2 (main.go:154 hardcodes one sink table)
        cfg = _run_pipeline(spark, tmp_path, _messages(20), name="routing")
        raw = spark.read.parquet(os.path.join(cfg.warehouse_dir, "nats_data_stream"))
        streams = {r["stream"] for r in raw.select("stream").distinct().collect()}
        assert streams == {"supprt", "crmabc"}

    def test_analytics_projection_applied(self, spark, tmp_path):
        cfg = _run_pipeline(spark, tmp_path, _messages(10), name="proj")
        ana = spark.read.parquet(os.path.join(cfg.warehouse_dir, ANALYTICS_TABLE))
        row = ana.filter(ana.message_id == "3").first()
        assert row["message_text"] == "hi-3"
        assert row["client_code"] == "globex"
        assert row["ym"] == 202403  # partition column materialized

    def test_restart_does_not_duplicate(self, spark, tmp_path):
        msgs = _messages(25)
        cfg = _run_pipeline(spark, tmp_path, msgs, name="restart")
        n1 = spark.read.parquet(os.path.join(cfg.warehouse_dir, ANALYTICS_TABLE)).count()
        _run_pipeline(spark, tmp_path, msgs, name="restart")  # same checkpoint
        n2 = spark.read.parquet(os.path.join(cfg.warehouse_dir, ANALYTICS_TABLE)).count()
        assert n1 == n2 == 25


class TestDeadLetter:
    def test_malformed_rows_kept_not_dropped(self, spark, tmp_path):
        # fixes reference quirk K4 (main.go:162-166: dropped rows still acked)
        rows = [
            (TS, "a.b.c.d", 1, "{}", "{}"),
            (None, "a.b.c.d", 2, "{}", "{}"),  # missing timestamp -> dead letter
        ]
        df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
        tables = PipelineTables(str(tmp_path / "wh2"))
        counts = apply_cascade(df, tables)
        assert counts["raw"] == 1
        assert counts["dead_letter"] == 1
        dead = spark.read.parquet(tables.path(DEAD_LETTER_TABLE))
        assert dead.count() == 1
        assert dead.first()["error"] == "missing jetstream metadata"


class TestBatchStreamingUnification:
    def test_apply_cascade_as_batch_backfill(self, spark, tmp_path):
        """The same cascade function is usable for batch backfills —
        Spark's batch/streaming unification."""
        rows = [
            (TS, f"globex.supprt.u{i}.c{i}.t", i, "{}", '{"text":"x"}')
            for i in range(7)
        ]
        df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
        tables = PipelineTables(str(tmp_path / "wh3"))
        counts = apply_cascade(df, tables)
        assert counts == {"raw": 7, "dead_letter": 0}
        ana = spark.read.parquet(tables.path(ANALYTICS_TABLE))
        assert ana.count() == 7


class TestIdempotentSink:
    def test_replayed_batch_not_duplicated(self, spark, tmp_path):
        """Exactly-once upgrade: applying the same batch twice (the
        at-least-once replay scenario, main.go:122-127) persists once."""
        rows = [
            (TS, f"globex.supprt.u{i}.c{i}.t", i, "{}", '{"text":"x"}')
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
        tables = PipelineTables(str(tmp_path / "wh_idem"))
        apply_cascade(df, tables, idempotent=True)
        apply_cascade(df, tables, idempotent=True)  # full replay
        ana = spark.read.parquet(tables.path(ANALYTICS_TABLE))
        assert ana.count() == 10

    def test_intra_batch_duplicates_collapsed(self, spark, tmp_path):
        rows = [(TS, "globex.supprt.u1.c1.t", 1, "{}", "{}")] * 3
        df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
        tables = PipelineTables(str(tmp_path / "wh_idem2"))
        apply_cascade(df, tables, idempotent=True)
        assert spark.read.parquet(tables.path(ANALYTICS_TABLE)).count() == 1

    def test_default_keeps_reference_at_least_once(self, spark, tmp_path):
        rows = [(TS, "globex.supprt.u1.c1.t", 1, "{}", "{}")]
        df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
        tables = PipelineTables(str(tmp_path / "wh_alo"))
        apply_cascade(df, tables)
        apply_cascade(df, tables)  # replay duplicates — reference contract
        assert spark.read.parquet(tables.path(ANALYTICS_TABLE)).count() == 2


class TestBackfill:
    def test_drain_in_admission_controlled_batches(self, spark, tmp_path):
        """run_backfill: everything currently available is processed, in
        multiple maxRecordsPerTrigger-bounded micro-batches, then stop."""
        from go_nats_to_clickhouse_spark.streaming.pipeline import run_backfill

        replay = tmp_path / "replay_an.jsonl"
        write_replay_file(str(replay), _messages(30))
        spark.dataSource.register(NatsDataSource)
        cfg = EngineConfig(
            warehouse_dir=str(tmp_path / "wh_an"),
            checkpoint_dir=str(tmp_path / "ckpt_an"),
        )
        src = (
            spark.readStream.format("nats-jetstream")
            .option("replayFile", str(replay))
            .option("subjects", "globex.>")
            .option("maxRecordsPerTrigger", 10)
            .load()
        )
        run_backfill(spark, cfg, src, query_name="an")
        ana = spark.read.parquet(os.path.join(cfg.warehouse_dir, ANALYTICS_TABLE))
        assert ana.count() == 30  # all three 10-row batches drained
