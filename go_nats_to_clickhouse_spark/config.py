"""Engine configuration: YAML file + environment-variable overrides.

Mirrors the semantics of the reference config loader
(``/root/reference/config/config.go:38-60``): a YAML file provides defaults,
and environment variables override individual keys, with ``.`` in the key
path replaced by ``_`` (viper's ``AutomaticEnv`` + replacer). We do the same
with plain Python so the engine has zero non-baked dependencies.

Reference config shape (``/root/reference/nats.yml:1-11``)::

    nats:
      url: nats://...
    clickhouse:
      url: ch://...
    log: {level: info, format: text}
    subjects: ["globex.supprt.>", "globex.crmabc.>"]

Our engine replaces the clickhouse sink with a warehouse directory of
partitioned Parquet tables, and (fixing reference quirk S2, main.go:88 —
only ``Subjects[0]`` consumed) subscribes to *all* configured subjects.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

try:  # PyYAML is commonly available but not guaranteed; gate it.
    import yaml  # type: ignore

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False

# Micro-batch envelope, matching the reference constants exactly
# (/root/reference/main.go:26-27).
DEFAULT_BATCH_SIZE = 1000
DEFAULT_BATCH_TIMEOUT_SECONDS = 5.0


@dataclass
class EngineConfig:
    """Runtime configuration for the engine."""

    nats_url: str = "nats://127.0.0.1:4222"
    warehouse_dir: str = "/tmp/gntcs_warehouse"
    checkpoint_dir: str = "/tmp/gntcs_checkpoints"
    subjects: list[str] = field(default_factory=lambda: ["globex.supprt.>"])
    durable_name: str = "nats-clickhouse-durable"
    delivery_group: str = "nats-clickhouse-delivery-group"
    batch_size: int = DEFAULT_BATCH_SIZE
    batch_timeout_seconds: float = DEFAULT_BATCH_TIMEOUT_SECONDS
    log_level: str = "info"
    log_format: str = "text"
    # Spark knobs (tuned for local[32] testing; on a real cluster these are
    # overridden by spark-submit / cluster defaults).
    master: str | None = None
    shuffle_partitions: int = 32
    #: local-mode JVM heap. The JVM default (~1 GB on this box) is a toy
    #: artifact: the round-9 sf1 probe showed an AQE broadcast whose
    #: compressed shuffle size passed the 10 MB threshold expanding to
    #: ~128 MB in memory and failing allocation under the default heap —
    #: while at real scale the same relation exceeds the threshold and
    #: AQE falls back to shuffle join on its own. Sizing the heap like a
    #: real driver removes the mid-scale trap. Only effective for the
    #: process's FIRST JVM (spark.driver.memory is a launch-time knob).
    driver_memory: str = "8g"
    extra_spark_conf: dict[str, str] = field(default_factory=dict)


_KEY_PATHS: dict[str, tuple[str, ...]] = {
    # config attr -> path inside the YAML document
    "nats_url": ("nats", "url"),
    "warehouse_dir": ("warehouse", "dir"),
    "checkpoint_dir": ("warehouse", "checkpoints"),
    "subjects": ("subjects",),
    "durable_name": ("nats", "durable"),
    "delivery_group": ("nats", "group"),
    "batch_size": ("batch", "size"),
    "batch_timeout_seconds": ("batch", "timeout_seconds"),
    "log_level": ("log", "level"),
    "log_format": ("log", "format"),
    "master": ("spark", "master"),
    "shuffle_partitions": ("spark", "shuffle_partitions"),
}


def _dig(doc: dict[str, Any], path: tuple[str, ...]) -> Any:
    cur: Any = doc
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return None
        cur = cur[p]
    return cur


def load_config(path: str | None = None, env: dict[str, str] | None = None) -> EngineConfig:
    """Load config from a YAML file, then apply env-var overrides.

    Env override convention (matching the reference's viper setup,
    config.go:44-46): key path ``nats.url`` is overridden by env var
    ``NATS_URL``; ``batch.size`` by ``BATCH_SIZE``; etc.
    """
    env = dict(os.environ if env is None else env)
    cfg = EngineConfig()

    doc: dict[str, Any] = {}
    if path is not None:
        if not _HAVE_YAML:
            raise RuntimeError("PyYAML not available; pass config via env vars instead")
        with open(path, encoding="utf-8") as fh:
            loaded = yaml.safe_load(fh)
        if loaded is not None and not isinstance(loaded, dict):
            raise ValueError(f"config root must be a mapping, got {type(loaded).__name__}")
        doc = loaded or {}

    for attr, key_path in _KEY_PATHS.items():
        val = _dig(doc, key_path)
        env_key = "_".join(key_path).upper()
        if env_key in env:
            val = env[env_key]
        if val is None:
            continue
        cur = getattr(cfg, attr)
        if isinstance(cur, bool):
            val = str(val).lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            val = int(val)
        elif isinstance(cur, float):
            val = float(val)
        elif isinstance(cur, list) and isinstance(val, str):
            val = [s.strip() for s in val.split(",") if s.strip()]
        setattr(cfg, attr, val)

    if cfg.batch_size <= 0:
        raise ValueError("batch.size must be positive")
    if cfg.batch_timeout_seconds <= 0:
        raise ValueError("batch.timeout_seconds must be positive")
    if not cfg.subjects:
        raise ValueError("at least one subject is required")
    return cfg
