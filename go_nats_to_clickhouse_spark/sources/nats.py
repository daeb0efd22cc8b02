"""NATS JetStream streaming source — Spark 4 Python Data Source API.

Re-expresses the reference's consumption model (main.go:86-94):

* durable consumer  -> Structured Streaming offsets are the JetStream
  *stream sequence* (monotone, replayable); the checkpoint is the durable
  cursor, so restart resumes exactly where the last committed batch ended
  — same contract as ``nats.Durable(...)``.
* queue-group load balancing -> partition planning: the sequence range of
  each micro-batch is split into ``partitions`` contiguous slices, one per
  task; on a cluster each slice is fetched by a different executor, which
  is the Spark-native analog of N queue-group members.
* count-triggered batches (main.go:26, batchSize=1000) ->
  ``maxRecordsPerTrigger`` admission control in ``latestOffset``.
* at-least-once ack-after-commit (main.go:199-208) -> ``commit(offset)``
  is invoked by Spark only after the batch's sink write succeeded; that is
  where consumed sequences are ack'ed upstream.

Transport: the actual NATS client (``nats-py``) is not installed in this
environment, so the wire layer is injectable. ``JetStreamClient`` is the
minimal protocol the source needs; tests and local runs use
:class:`ReplayJetStreamClient` (deterministic, in-memory). Wiring a real
client is confined to ``_connect`` — the planner/reader logic is already
final.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from go_nats_to_clickhouse_spark.schemas import MESSAGE_SCHEMA


@dataclass
class JsMessage:
    """One JetStream message: what main.go:160-191 consumes per record."""

    subject: str
    data: str  # JSON payload (opaque)
    sequence: int  # stream sequence (the replayable offset)
    timestamp_us: int  # JetStream receive time, epoch micros
    metadata_json: str = "{}"


class JetStreamClient:
    """Minimal JetStream transport protocol used by the source."""

    def max_sequence(self) -> int:  # newest stream sequence (0 if empty)
        raise NotImplementedError

    def fetch(self, start_seq: int, end_seq: int, subjects: Sequence[str]) -> list[JsMessage]:
        """Messages with start_seq < sequence <= end_seq matching subjects."""
        raise NotImplementedError

    def ack_through(self, seq: int) -> None:  # cumulative ack (commit hook)
        raise NotImplementedError


class ReplayJetStreamClient(JetStreamClient):
    """Deterministic in-memory JetStream for tests/dev: a pre-loaded or
    appendable sequence of messages, replayable from any offset (JetStream
    streams are replayable by sequence, which is what makes the reference's
    durable-consumer semantics recoverable)."""

    def __init__(self, messages: Sequence[JsMessage] = ()):  # sorted by seq
        self._messages = sorted(messages, key=lambda m: m.sequence)
        self.acked_through = 0

    def publish(self, msg: JsMessage) -> None:
        self._messages.append(msg)

    def max_sequence(self) -> int:
        return self._messages[-1].sequence if self._messages else 0

    def fetch(self, start_seq: int, end_seq: int, subjects: Sequence[str]) -> list[JsMessage]:
        return [
            m
            for m in self._messages
            if start_seq < m.sequence <= end_seq
            and any(_subject_matches(m.subject, pat) for pat in subjects)
        ]

    def ack_through(self, seq: int) -> None:
        self.acked_through = max(self.acked_through, seq)


def _subject_matches(subject: str, pattern: str) -> bool:
    """NATS subject matching: '.'-separated tokens, '*' = one token,
    '>' = one-or-more trailing tokens."""
    s_toks = subject.split(".")
    p_toks = pattern.split(".")
    for i, p in enumerate(p_toks):
        if p == ">":
            return len(s_toks) >= i + 1
        if i >= len(s_toks):
            return False
        if p != "*" and p != s_toks[i]:
            return False
    return len(s_toks) == len(p_toks)


@dataclass
class SeqRangePartition(InputPartition):
    start_seq: int  # exclusive
    end_seq: int  # inclusive


class NatsStreamReader(DataSourceStreamReader):
    """Offset = {"seq": <last stream sequence admitted>}."""

    def __init__(self, schema: StructType, options: dict):
        # Spark passes Python data source options with case-insensitive
        # (lowercased) keys — normalize so camelCase callers work both via
        # Spark and in direct construction (tests).
        self._options = {str(k).lower(): v for k, v in dict(options).items()}
        self._subjects = [
            s.strip() for s in self._options.get("subjects", ">").split(",") if s.strip()
        ]
        self._max_per_trigger = int(self._options.get("maxrecordspertrigger", 1000))
        self._num_partitions = int(self._options.get("partitions", 4))
        self._last_planned: int | None = None  # driver-side planning cursor

    @property
    def _client(self) -> JetStreamClient:
        # Resolved through a per-process cache, never stored on the reader:
        # the reader object is pickled to every task, and a transport
        # holding the whole replay stream must not travel with it. Each
        # worker process connects (or parses the replay file) once.
        return _connect(self._options)

    def initialOffset(self) -> dict:
        return {"seq": int(self._options.get("startingsequence", 0))}

    def latestOffset(self) -> dict:
        # Count-trigger admission control (ref batchSize=1000): admit at most
        # maxRecordsPerTrigger sequences past the previous planned offset.
        # Clamping HERE (not in partitions()) keeps the checkpointed offset
        # equal to what was actually read — nothing is silently skipped.
        base = (
            self._last_planned
            if self._last_planned is not None
            else int(self._options.get("startingsequence", 0))
        )
        newest = self._client.max_sequence()
        planned = min(max(newest, base), base + self._max_per_trigger)
        self._last_planned = planned
        return {"seq": planned}

    def partitions(self, start: dict, end: dict) -> list[SeqRangePartition]:
        lo, hi = int(start["seq"]), int(end["seq"])
        if hi <= lo:
            return [SeqRangePartition(lo, lo)]
        n = max(1, self._num_partitions)
        step = max(1, (hi - lo + n - 1) // n)
        parts = []
        s = lo
        while s < hi:
            e = min(s + step, hi)
            parts.append(SeqRangePartition(s, e))
            s = e
        return parts

    def read(self, partition: SeqRangePartition) -> Iterator[tuple]:
        import datetime as _dt

        if partition.end_seq <= partition.start_seq:
            return iter(())
        msgs = self._client.fetch(partition.start_seq, partition.end_seq, self._subjects)
        return iter(
            (
                _dt.datetime.fromtimestamp(m.timestamp_us / 1e6, tz=_dt.timezone.utc),
                m.subject,
                m.sequence,
                m.metadata_json,
                m.data,
            )
            for m in msgs
        )

    def commit(self, end: dict) -> None:
        # Ack-after-commit (main.go:199-208): Spark calls this only after the
        # micro-batch has been durably written + checkpointed.
        self._client.ack_through(int(end["seq"]))


class NatsDataSource(DataSource):
    """spark.readStream.format("nats-jetstream") after
    ``spark.dataSource.register(NatsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "nats-jetstream"

    def schema(self) -> StructType:
        return MESSAGE_SCHEMA

    def streamReader(self, schema: StructType) -> NatsStreamReader:
        return NatsStreamReader(schema, self.options)


#: per-process transport cache (workers are reused across batches)
_CLIENT_CACHE: dict = {}


def _connect(options: dict) -> JetStreamClient:
    """Build (or fetch the cached) transport. ``replayFile`` ->
    deterministic local replay; a real ``nats://`` URL requires the
    nats-py client (not baked into this environment — gated import)."""
    replay_file = options.get("replayfile") or options.get("replayFile")
    if replay_file:
        import os as _os

        key = (replay_file, _os.path.getmtime(replay_file))
        client = _CLIENT_CACHE.get(key)
        if client is None:
            with open(replay_file, encoding="utf-8") as fh:
                msgs = [JsMessage(**json.loads(line)) for line in fh if line.strip()]
            client = ReplayJetStreamClient(msgs)
            _CLIENT_CACHE[key] = client
        return client
    try:  # pragma: no cover - not installed here
        import nats  # type: ignore # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "real NATS transport requires the 'nats-py' client, which is not "
            "installed in this environment; use option('replayFile', ...) for "
            "the deterministic replay transport"
        ) from exc
    raise NotImplementedError("wire nats-py JetStream pull consumer here")  # pragma: no cover


def write_replay_file(path: str, messages: Sequence[JsMessage]) -> None:
    """Persist messages as a replay file (one JSON object per line)."""
    with open(path, "w", encoding="utf-8") as fh:
        for m in messages:
            fh.write(
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
