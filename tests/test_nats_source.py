"""NATS JetStream source unit tests (SURVEY.md §2.1-2.2): subject matching,
sequence-offset admission control, partition planning, replay transport."""

from __future__ import annotations

import pytest

from go_nats_to_clickhouse_spark.schemas import MESSAGE_SCHEMA
from go_nats_to_clickhouse_spark.sources.nats import (
    JsMessage,
    NatsStreamReader,
    ReplayJetStreamClient,
    _subject_matches,
)


def _msgs(n, subject_fn=lambda i: f"globex.supprt.u{i}.c{i}.evt"):
    return [
        JsMessage(
            subject=subject_fn(i),
            data="{}",
            sequence=i + 1,
            timestamp_us=1_700_000_000_000_000 + i,
        )
        for i in range(n)
    ]


class TestSubjectMatching:
    def test_exact(self):
        assert _subject_matches("a.b.c", "a.b.c")

    def test_wildcard_token(self):
        assert _subject_matches("a.b.c", "a.*.c")
        assert not _subject_matches("a.b.c", "a.*.d")

    def test_trailing_gt_matches_one_or_more(self):
        assert _subject_matches("globex.supprt.x.y", "globex.supprt.>")
        assert _subject_matches("globex.supprt.x", "globex.supprt.>")
        assert not _subject_matches("globex.supprt", "globex.supprt.>")

    def test_length_mismatch(self):
        assert not _subject_matches("a.b", "a.b.c")
        assert not _subject_matches("a.b.c", "a.b")


class TestReplayClient:
    def test_fetch_range_and_filter(self):
        client = ReplayJetStreamClient(_msgs(10))
        got = client.fetch(2, 5, ["globex.supprt.>"])
        assert [m.sequence for m in got] == [3, 4, 5]

    def test_ack_through_is_monotone(self):
        client = ReplayJetStreamClient(_msgs(3))
        client.ack_through(2)
        client.ack_through(1)
        assert client.acked_through == 2


def _reader(client_msgs, max_per_trigger=1000, **opts):
    import json
    import tempfile

    # route through the replayFile transport (what production options do)
    f = tempfile.NamedTemporaryFile(
        mode="w", suffix=".jsonl", delete=False, encoding="utf-8"
    )
    for m in client_msgs:
        f.write(
            json.dumps(
                {
                    "subject": m.subject,
                    "data": m.data,
                    "sequence": m.sequence,
                    "timestamp_us": m.timestamp_us,
                    "metadata_json": m.metadata_json,
                }
            )
            + "\n"
        )
    f.close()
    options = {
        "replayFile": f.name,
        "subjects": "globex.>",
        "maxRecordsPerTrigger": str(max_per_trigger),
        **opts,
    }
    return NatsStreamReader(MESSAGE_SCHEMA, options)


class TestAdmissionControl:
    def test_count_trigger_caps_batch(self):
        # ref batchSize=1000 (main.go:26): a flood of messages is admitted in
        # maxRecordsPerTrigger-sized slices, nothing skipped.
        r = _reader(_msgs(2500), max_per_trigger=1000)
        o0 = r.initialOffset()
        o1 = r.latestOffset()
        o2 = r.latestOffset()
        o3 = r.latestOffset()
        assert (o0["seq"], o1["seq"], o2["seq"], o3["seq"]) == (0, 1000, 2000, 2500)

    def test_partitions_split_range(self):
        r = _reader(_msgs(100), partitions="4")
        parts = r.partitions({"seq": 0}, {"seq": 100})
        assert len(parts) == 4
        assert parts[0].start_seq == 0 and parts[-1].end_seq == 100
        # contiguous, no gaps
        for a, b in zip(parts, parts[1:]):
            assert a.end_seq == b.start_seq

    def test_read_yields_rows_in_slice(self):
        r = _reader(_msgs(10))
        parts = r.partitions({"seq": 0}, {"seq": 10})
        rows = [row for p in parts for row in r.read(p)]
        assert len(rows) == 10
        assert sorted(r[2] for r in rows) == list(range(1, 11))

    def test_empty_range_yields_nothing(self):
        r = _reader(_msgs(5))
        parts = r.partitions({"seq": 5}, {"seq": 5})
        assert all(len(list(r.read(p))) == 0 for p in parts)

    def test_commit_acks_upstream(self):
        # ack-after-commit (main.go:199-208)
        r = _reader(_msgs(5))
        r.commit({"seq": 5})
        assert r._client.acked_through == 5


class TestEndToEndStream:
    def test_stream_into_memory_sink(self, spark, tmp_path):
        import json

        from go_nats_to_clickhouse_spark.sources.nats import (
            NatsDataSource,
            write_replay_file,
        )

        replay = tmp_path / "replay.jsonl"
        write_replay_file(str(replay), _msgs(30))
        spark.dataSource.register(NatsDataSource)
        df = (
            spark.readStream.format("nats-jetstream")
            .option("replayFile", str(replay))
            .option("subjects", "globex.supprt.>")
            .option("maxRecordsPerTrigger", 10)
            .load()
        )
        q = (
            df.writeStream.format("memory")
            .queryName("nats_mem_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql("SELECT count(*) AS n FROM nats_mem_sink").first()["n"]
            assert got == 30
        finally:
            q.stop()
