"""Service entrypoint — the analog of the reference's ``main.go``.

Boot sequence mirrors main.go:30-105: load config (file + env), init
logging + banner, build the session, subscribe to ALL configured subjects
(fixing reference quirk S2), start the ingest pipeline, then wait; SIGINT/
SIGTERM triggers a graceful drain-and-stop (flush-on-shutdown,
main.go:52-62 + 138-147).

Usage::

    python -m go_nats_to_clickhouse_spark --config engine.yml \
        --replay-file messages.jsonl [--drain] [--idempotent]

``--replay-file`` selects the deterministic replay transport (the real
NATS transport needs nats-py — not installed here). ``--drain`` runs a
backfill (process everything available, then exit) instead of the
continuous service loop.
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="go_nats_to_clickhouse_spark")
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("--replay-file", default=None, help="replay transport file")
    parser.add_argument("--drain", action="store_true", help="backfill then exit")
    parser.add_argument(
        "--idempotent", action="store_true", help="exactly-once sink upgrade"
    )
    parser.add_argument(
        "--compact",
        action="store_true",
        help="compact warehouse tables (MergeTree background-merge analog) and exit",
    )
    args = parser.parse_args(argv)

    from go_nats_to_clickhouse_spark.config import load_config
    from go_nats_to_clickhouse_spark.logging_setup import config_banner, init_logging
    from go_nats_to_clickhouse_spark.session import get_spark
    from go_nats_to_clickhouse_spark.sources.nats import NatsDataSource
    from go_nats_to_clickhouse_spark.streaming.pipeline import (
        run_backfill,
        start_pipeline,
        stop_gracefully,
    )

    cfg = load_config(args.config)
    logger = init_logging(cfg)
    config_banner(cfg, logger)

    spark = get_spark(cfg, app_name="gntcs-service")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(NatsDataSource)

    if args.compact:
        import os as _os

        from go_nats_to_clickhouse_spark.plans import layout
        from go_nats_to_clickhouse_spark.streaming.pipeline import (
            ALL_STREAMS_TABLE,
            ANALYTICS_TABLE,
        )

        for table, fam, pcols in (
            ("nats_data_stream", "raw", ("stream", layout.PARTITION_COL)),
            (ALL_STREAMS_TABLE, "all_streams", (layout.PARTITION_COL,)),
            (ANALYTICS_TABLE, "analytics", (layout.PARTITION_COL,)),
        ):
            path = _os.path.join(cfg.warehouse_dir, table)
            if _os.path.exists(path):
                logger.info("compacting %s", path)
                layout.compact_table(
                    spark,
                    path,
                    layout.SORT_KEYS[fam],
                    partition_cols=pcols,
                    bloom_cols=layout.BLOOM_KEYS[fam],
                )
        logger.info("compaction complete")
        spark.stop()
        return 0

    reader = spark.readStream.format("nats-jetstream").option(
        "subjects", ",".join(cfg.subjects)
    ).option("maxRecordsPerTrigger", cfg.batch_size)
    if args.replay_file:
        reader = reader.option("replayFile", args.replay_file)
    source = reader.load()

    if args.drain:
        logger.info("backfill: draining available messages...")
        run_backfill(spark, cfg, source, idempotent=args.idempotent)
        logger.info("backfill complete")
        spark.stop()
        return 0

    query = start_pipeline(spark, cfg, source, idempotent=args.idempotent)
    logger.info(
        "service started; subjects=%s batch=%d/%ss warehouse=%s",
        cfg.subjects,
        cfg.batch_size,
        cfg.batch_timeout_seconds,
        cfg.warehouse_dir,
    )

    stop_event = threading.Event()

    def _shutdown(signum, frame):  # noqa: ARG001
        logger.info("shutdown signal received, starting graceful shutdown...")
        stop_event.set()

    signal.signal(signal.SIGINT, _shutdown)
    signal.signal(signal.SIGTERM, _shutdown)

    while not stop_event.is_set():
        stop_event.wait(1.0)
        if query.exception() is not None:
            logger.error("pipeline failed: %s", query.exception())
            spark.stop()
            return 1
    # flush-on-shutdown: drain admitted records before exiting
    stop_gracefully(query)
    logger.info("batch processor shut down cleanly")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
