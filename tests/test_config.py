"""Config loader tests — mirrors the reference's only test suite
(config/config_test.go:37-128): happy path, env override, failure cases."""

from __future__ import annotations

import pytest

from go_nats_to_clickhouse_spark.config import (
    DEFAULT_BATCH_SIZE,
    DEFAULT_BATCH_TIMEOUT_SECONDS,
    EngineConfig,
    load_config,
)


def test_defaults_match_reference_constants():
    cfg = EngineConfig()
    # main.go:26-27: batchSize=1000, batchTimeout=5s
    assert cfg.batch_size == DEFAULT_BATCH_SIZE == 1000
    assert cfg.batch_timeout_seconds == DEFAULT_BATCH_TIMEOUT_SECONDS == 5.0
    # main.go:86-87 durable/group names
    assert cfg.durable_name == "nats-clickhouse-durable"
    assert cfg.delivery_group == "nats-clickhouse-delivery-group"


def test_load_yaml_happy_path(tmp_path):
    f = tmp_path / "engine.yml"
    f.write_text(
        """
nats:
  url: nats://example:4222
subjects:
  - "globex.supprt.>"
  - "globex.crmabc.>"
batch:
  size: 500
  timeout_seconds: 2.5
log: {level: debug, format: json}
""",
        encoding="utf-8",
    )
    cfg = load_config(str(f), env={})
    assert cfg.nats_url == "nats://example:4222"
    assert cfg.subjects == ["globex.supprt.>", "globex.crmabc.>"]
    assert cfg.batch_size == 500
    assert cfg.batch_timeout_seconds == 2.5
    assert cfg.log_level == "debug"


def test_env_overrides_yaml(tmp_path):
    # config_test.go:62-95: AutomaticEnv with '.'->'_' replacer
    f = tmp_path / "engine.yml"
    f.write_text("nats:\n  url: nats://from-yaml:4222\n", encoding="utf-8")
    cfg = load_config(str(f), env={"NATS_URL": "nats://from-env:4222", "BATCH_SIZE": "77"})
    assert cfg.nats_url == "nats://from-env:4222"
    assert cfg.batch_size == 77


def test_env_only_no_file():
    cfg = load_config(None, env={"SUBJECTS": "a.>,b.>"})
    assert cfg.subjects == ["a.>", "b.>"]


@pytest.mark.parametrize(
    "env",
    [
        {"BATCH_SIZE": "0"},
        {"BATCH_SIZE": "-5"},
        {"BATCH_TIMEOUT_SECONDS": "0"},
        {"SUBJECTS": ""},
    ],
)
def test_invalid_values_rejected(env):
    # config_test.go:97-127: table-driven failure cases
    with pytest.raises(ValueError):
        load_config(None, env=env)


def test_non_numeric_batch_size_raises():
    with pytest.raises(ValueError):
        load_config(None, env={"BATCH_SIZE": "not-a-number"})


def test_malformed_yaml_rejected(tmp_path):
    f = tmp_path / "bad.yml"
    f.write_text("- just\n- a\n- list\n", encoding="utf-8")
    with pytest.raises(ValueError):
        load_config(str(f), env={})


class TestLogging:
    def test_levels_and_formats(self):
        import logging

        from go_nats_to_clickhouse_spark.logging_setup import (
            config_banner,
            init_logging,
        )

        lg = init_logging(EngineConfig(log_level="debug", log_format="json"))
        assert lg.level == logging.DEBUG
        lg2 = init_logging(EngineConfig(log_level="warn", log_format="text"))
        assert lg2.level == logging.WARNING
        banner = config_banner(EngineConfig(batch_size=123))
        assert "batch_size = 123" in banner
