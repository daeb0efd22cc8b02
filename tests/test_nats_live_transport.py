"""Exercise the REAL ``NatsPyJetStreamClient`` code — event-loop thread,
connect/KV-bucket flow, sequence-windowed fetch loop, ack-after-commit
cursor write, drain-on-close — against an in-process, protocol-faithful
fake of the public nats-py API (installed into ``sys.modules``, since
the sandbox has neither nats-py nor a broker).

What this does and does not prove: every line of the transport's
orchestration runs (the code previously marked "needs broker"), with
the fake honoring the nats-py surface the code uses — ``nats.connect``,
``js.stream_info().state.last_seq``, ``js.key_value`` raising
``NotFoundError`` before ``create_key_value``, ``js.pull_subscribe``
with a ``ConsumerConfig(deliver_policy=BY_START_SEQUENCE,
opt_start_seq=...)``, batch ``sub.fetch`` raising ``TimeoutError`` when
drained, per-message ``metadata.sequence.stream`` /
``metadata.timestamp`` / ``metadata.domain``. The actual socket layer
remains environmental (no broker in the sandbox); reference parity:
main.go:86-94 (consumer), main.go:199-208 (ack after commit).
"""

from __future__ import annotations

import asyncio
import json
import sys
import types
from dataclasses import dataclass, field
from datetime import datetime, timezone
from types import SimpleNamespace


def _subject_matches(pattern: str, subject: str) -> bool:
    ps, ss = pattern.split("."), subject.split(".")
    for i, p in enumerate(ps):
        if p == ">":
            return True
        if i >= len(ss) or (p != "*" and p != ss[i]):
            return False
    return len(ps) == len(ss)


@dataclass
class _FakeBrokerMsg:
    subject: str
    data: bytes
    seq: int
    ts: datetime
    domain: str | None = None


class _FakeServer:
    """In-process JetStream state: one stream of messages + KV buckets."""

    def __init__(self, messages):
        self.messages = sorted(messages, key=lambda m: m.seq)
        self.buckets: dict[str, dict[str, bytes]] = {}
        self.drained = False
        self.pull_configs: list = []
        self.unsubscribed: list = []


class _FakeKV:
    def __init__(self, store: dict):
        self._store = store

    async def put(self, key: str, value: bytes):
        self._store[key] = value


class _FakeSub:
    def __init__(self, server: _FakeServer, config):
        filters = config.filter_subjects
        self._pending = [
            m
            for m in server.messages
            if m.seq >= config.opt_start_seq
            and (
                not filters
                or any(_subject_matches(p, m.subject) for p in filters)
            )
        ]
        self._server = server

    async def fetch(self, batch: int, timeout=None):
        if not self._pending:
            raise asyncio.TimeoutError  # what nats-py raises when drained
        out, self._pending = self._pending[:batch], self._pending[batch:]
        return [
            SimpleNamespace(
                subject=m.subject,
                data=m.data,
                metadata=SimpleNamespace(
                    sequence=SimpleNamespace(stream=m.seq),
                    timestamp=m.ts,
                    domain=m.domain,
                ),
            )
            for m in out
        ]

    async def unsubscribe(self):
        self._server.unsubscribed.append(self)


class _FakeJetStream:
    def __init__(self, server: _FakeServer, errors_mod):
        self._server = server
        self._errors = errors_mod

    async def stream_info(self, stream: str):
        last = self._server.messages[-1].seq if self._server.messages else 0
        return SimpleNamespace(state=SimpleNamespace(last_seq=last))

    async def key_value(self, bucket: str):
        if bucket not in self._server.buckets:
            raise self._errors.NotFoundError(bucket)
        return _FakeKV(self._server.buckets[bucket])

    async def create_key_value(self, bucket: str):
        store = self._server.buckets.setdefault(bucket, {})
        return _FakeKV(store)

    async def pull_subscribe(self, subject: str, stream: str, config):
        self._server.pull_configs.append((stream, config))
        return _FakeSub(self._server, config)


class _FakeNC:
    def __init__(self, server: _FakeServer, servers):
        self._server = server
        self.servers = servers

    def jetstream(self):
        return _FakeJetStream(self._server, sys.modules["nats.js.errors"])

    async def drain(self):
        self._server.drained = True


def _install_fake_nats(monkeypatch, server: _FakeServer):
    nats_mod = types.ModuleType("nats")
    js_mod = types.ModuleType("nats.js")
    api_mod = types.ModuleType("nats.js.api")
    err_mod = types.ModuleType("nats.js.errors")

    class NotFoundError(Exception):
        pass

    err_mod.NotFoundError = NotFoundError

    @dataclass
    class ConsumerConfig:
        deliver_policy: object = None
        opt_start_seq: int = 0
        filter_subjects: object = None
        extras: dict = field(default_factory=dict)

    class DeliverPolicy:
        BY_START_SEQUENCE = "by_start_sequence"

    api_mod.ConsumerConfig = ConsumerConfig
    api_mod.DeliverPolicy = DeliverPolicy

    async def connect(servers=None):
        return _FakeNC(server, servers)

    nats_mod.connect = connect
    nats_mod.js = js_mod
    js_mod.api = api_mod
    js_mod.errors = err_mod
    for name, mod in (
        ("nats", nats_mod),
        ("nats.js", js_mod),
        ("nats.js.api", api_mod),
        ("nats.js.errors", err_mod),
    ):
        monkeypatch.setitem(sys.modules, name, mod)


def _ts(sec: int) -> datetime:
    return datetime.fromtimestamp(1_700_000_000 + sec, tz=timezone.utc)


def _server():
    return _FakeServer(
        [
            _FakeBrokerMsg("chats.support.7", b'{"a":1}', 1, _ts(1)),
            _FakeBrokerMsg("chats.sales.9", b'{"a":2}', 2, _ts(2)),
            _FakeBrokerMsg("other.topic", b"skip-me", 3, _ts(3)),
            _FakeBrokerMsg("chats.support.7", b'{"a":3}', 4, _ts(4), "hub"),
            _FakeBrokerMsg("chats.support.8", b"\xff-bad-utf8", 5, _ts(5)),
            _FakeBrokerMsg("chats.sales.9", b'{"a":4}', 6, _ts(6)),
        ]
    )


def test_live_transport_full_lifecycle(monkeypatch):
    server = _server()
    _install_fake_nats(monkeypatch, server)
    from go_nats_to_clickhouse_spark.sources.nats import NatsPyJetStreamClient

    client = NatsPyJetStreamClient(
        ["nats://a:4222"], "globex_support", "spark-ingest"
    )
    try:
        # connect created the cursor KV bucket via the NotFoundError path
        assert "spark-ingest-cursor" in server.buckets

        assert client.max_sequence() == 6

        # empty window short-circuits without a consumer
        assert client.fetch(4, 4, (">",)) == []
        assert not server.pull_configs

        # sequence-addressed pull: (start_seq, end_seq] with subject filter
        msgs = client.fetch(0, 4, ("chats.>",))
        stream, config = server.pull_configs[-1]
        assert stream == "globex_support"
        assert config.deliver_policy == "by_start_sequence"
        assert config.opt_start_seq == 1  # start_seq + 1
        assert config.filter_subjects == ["chats.>"]
        assert [m.sequence for m in msgs] == [1, 2, 4]  # 3 filtered, 5 > end
        assert msgs[0].data == '{"a":1}'
        assert msgs[0].timestamp_us == int(_ts(1).timestamp() * 1_000_000)
        assert json.loads(msgs[2].metadata_json) == {
            "stream": "globex_support",
            "domain": "hub",
        }
        assert server.unsubscribed  # consumer cleaned up

        # '>' collapses to no server-side filter; drain ends on TimeoutError
        msgs = client.fetch(0, 100, (">",))
        assert server.pull_configs[-1][1].filter_subjects is None
        assert [m.sequence for m in msgs] == [1, 2, 3, 4, 5, 6]
        assert "�" in msgs[4].data  # bad utf-8 replaced, not crashed

        # '>' mixed with narrower patterns must STILL mean match-all:
        # keeping only the narrow ones would drop messages '>' matches
        # (the replay transport delivers them — transports must agree)
        msgs = client.fetch(0, 100, ("chats.>", ">"))
        assert server.pull_configs[-1][1].filter_subjects is None
        assert [m.sequence for m in msgs] == [1, 2, 3, 4, 5, 6]

        # ack-after-commit persists the cursor in the durable's KV bucket
        client.ack_through(4)
        assert server.buckets["spark-ingest-cursor"]["acked_through"] == b"4"
    finally:
        client.close()
    assert server.drained
    assert not client._loop.is_running()


def test_connect_selects_and_caches_live_transport(monkeypatch):
    server = _server()
    _install_fake_nats(monkeypatch, server)
    from go_nats_to_clickhouse_spark.sources import nats as natsmod

    monkeypatch.setattr(natsmod, "_CLIENT_CACHE", {})
    opts = {"servers": "nats://a:4222,nats://b:4222", "stream": "globex_support"}
    client = natsmod._connect(opts)
    try:
        assert isinstance(client, natsmod.NatsPyJetStreamClient)
        assert client._servers == ["nats://a:4222", "nats://b:4222"]
        assert natsmod._connect(dict(opts)) is client  # per-process cache
    finally:
        client.close()


def test_fetch_empty_subjects_matches_replay_semantics(monkeypatch):
    """An empty subject list must fetch NOTHING on the live transport,
    matching ReplayJetStreamClient (no patterns -> no matches). Without
    the guard, `list([]) or None` would send filter_subjects=None —
    JetStream's match-ALL — the exact transport divergence the
    filter_subjects comment warns about (reachable via
    option('subjects', '') which strips to [] in NatsStreamReader)."""
    server = _server()
    _install_fake_nats(monkeypatch, server)
    from go_nats_to_clickhouse_spark.sources.nats import NatsPyJetStreamClient

    client = NatsPyJetStreamClient(["nats://a:4222"], "globex_support", "d3")
    try:
        assert client.fetch(0, 100, ()) == []
        assert not server.pull_configs  # no consumer even created
    finally:
        client.close()


def test_close_is_idempotent_and_evicts_cache(monkeypatch):
    """A second close() must be a no-op (the first one stopped and closed
    the event loop, so any _run afterwards would raise RuntimeError), and
    close() must pop the client from _CLIENT_CACHE so a later _connect
    with the same options rebuilds a live transport instead of returning
    the dead one."""
    server = _server()
    _install_fake_nats(monkeypatch, server)
    from go_nats_to_clickhouse_spark.sources import nats as natsmod

    monkeypatch.setattr(natsmod, "_CLIENT_CACHE", {})
    opts = {"servers": "nats://a:4222", "stream": "globex_support"}
    client = natsmod._connect(opts)
    client.close()
    client.close()  # idempotent: must not raise on the closed loop
    assert natsmod._CLIENT_CACHE == {}
    rebuilt = natsmod._connect(dict(opts))
    try:
        assert rebuilt is not client
        assert rebuilt.max_sequence() == 6  # the rebuilt transport is live
    finally:
        rebuilt.close()


def test_fetch_early_stop_with_small_batches(monkeypatch):
    """end_seq lands mid-batch: the loop must stop WITHOUT draining the
    rest of the stream (the `seq > end_seq -> done` branch) even when
    later fetch batches would still return messages."""
    server = _server()
    _install_fake_nats(monkeypatch, server)
    from go_nats_to_clickhouse_spark.sources.nats import NatsPyJetStreamClient

    client = NatsPyJetStreamClient(["nats://a:4222"], "globex_support", "d2")
    try:
        monkeypatch.setattr(client, "FETCH_BATCH", 2)
        msgs = client.fetch(0, 3, (">",))
        assert [m.sequence for m in msgs] == [1, 2, 3]
    finally:
        client.close()
