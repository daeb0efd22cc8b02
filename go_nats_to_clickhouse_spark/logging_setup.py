"""Engine logging: level/format from config, plus the startup banner.

Mirrors the reference's logger package semantics (logger/logger.go:18-52):
``log.level`` selects the threshold, ``log.format`` selects ``json`` or
human ``text`` output, and a configuration banner is emitted at startup so
operators can see the effective config in the logs.
"""

from __future__ import annotations

import json
import logging
import sys
from dataclasses import asdict

from go_nats_to_clickhouse_spark.config import EngineConfig

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "ts": self.formatTime(record),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        return json.dumps(payload)


def init_logging(cfg: EngineConfig) -> logging.Logger:
    """Configure and return the engine logger (idempotent)."""
    logger = logging.getLogger("gntcs")
    logger.setLevel(_LEVELS.get(cfg.log_level.lower(), logging.INFO))
    logger.handlers.clear()
    handler = logging.StreamHandler(sys.stderr)
    if cfg.log_format.lower() == "json":
        handler.setFormatter(_JsonFormatter())
    else:
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)-5s %(name)s: %(message)s")
        )
    logger.addHandler(handler)
    logger.propagate = False
    return logger


def config_banner(cfg: EngineConfig, logger: logging.Logger | None = None) -> str:
    """Log (and return) the effective configuration — the analog of
    logger.ConfigBanner (main.go:48)."""
    logger = logger or logging.getLogger("gntcs")
    lines = ["engine configuration:"]
    for k, v in asdict(cfg).items():
        lines.append(f"  {k} = {v!r}")
    banner = "\n".join(lines)
    logger.info(banner)
    return banner
