"""Service entrypoint (python -m go_nats_to_clickhouse_spark) — the
main.go-equivalent boot/drain lifecycle, driven as a real subprocess."""

from __future__ import annotations

import datetime as dt
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_drain_mode_end_to_end(tmp_path):
    from go_nats_to_clickhouse_spark.sources.nats import JsMessage, write_replay_file

    base = int(dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    replay = tmp_path / "replay.jsonl"
    write_replay_file(
        str(replay),
        [
            JsMessage(
                subject=f"globex.supprt.u{i}.c{i}.t",
                data='{"text":"x"}',
                sequence=i + 1,
                timestamp_us=base + i * 1000,
            )
            for i in range(40)
        ],
    )
    cfg = tmp_path / "engine.yml"
    cfg.write_text(
        f"""
warehouse:
  dir: {tmp_path}/wh
  checkpoints: {tmp_path}/ckpt
subjects: ["globex.>"]
batch: {{size: 15, timeout_seconds: 1}}
log: {{level: info, format: text}}
spark: {{master: "local[2]", shuffle_partitions: 2}}
""",
        encoding="utf-8",
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "go_nats_to_clickhouse_spark",
            "--config",
            str(cfg),
            "--replay-file",
            str(replay),
            "--drain",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "backfill complete" in proc.stderr

    import duckdb

    n = duckdb.sql(
        f"select count(*) from '{tmp_path}/wh/analitics_data/*/*.parquet'"
    ).fetchone()[0]
    assert n == 40
