"""Micro-batch ingestion pipeline: source -> raw -> union -> analytics.

Reproduces the reference's end-to-end flow (SURVEY.md §3.1-3.2) in one
Structured Streaming query:

* count/time micro-batch triggers (main.go:26-27: 1000 rows / 5 s) ->
  ``trigger(processingTime=...)`` + source-side ``maxRecordsPerTrigger``
  admission control;
* the ClickHouse MV cascade (init.sql:49-121) -> a single ``foreachBatch``
  that derives raw, union and analytics layouts from the same in-memory
  batch and appends all three tables. Writing all levels from one batch
  sidesteps the MV-chain consistency problem: a batch is either fully
  applied or fully retried;
* at-least-once (main.go:199-208 ack-after-commit) -> checkpointing: the
  offset commit happens only after foreachBatch returns, so a crashed batch
  replays — same possible-duplicates contract as the reference;
* flush-on-shutdown (main.go:138-147) -> ``query.stop()`` lets the running
  trigger finish draining admitted records;
* dead-letter instead of silent loss (fixes reference quirk K4,
  main.go:162-166): rows with null timestamp/sequence/subject go to a
  ``dead_letter`` table, not the floor, and remain counted.

Scale posture: every transform here is a narrow projection (no shuffle);
per-batch work is bounded by ``batch_size`` admission control; state lives
in the checkpoint, not the driver. On a cluster the same code runs with a
partitioned source (one NATS consumer per partition ≈ queue-group member).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from go_nats_to_clickhouse_spark.config import EngineConfig
from go_nats_to_clickhouse_spark.operators.analytics import (
    analytics_projection,
    message_to_raw,
)
from go_nats_to_clickhouse_spark.plans import layout

#: engine table names -> warehouse subdirectories
RAW_TABLE_PREFIX = "nats_data_stream_"
ALL_STREAMS_TABLE = "nats_data_all_streams"
ANALYTICS_TABLE = "analitics_data"  # (sic) — keep the reference's spelling
DEAD_LETTER_TABLE = "dead_letter"
HEALTH_TABLE = "service_health"

#: service_health row shape: one row per (batch, sink family) the
#: composed service processed, plus maintenance events appended by the
#: erase/promotion paths — the queryable analog of the reference's
#: per-batch slog banner (main.go:169-171 logs inserted-row counts) and
#: of ClickHouse's system.part_log/system.query_log observability
#: surface. ``drift`` carries the ANN drift-guard ratio (null for
#: non-ANN families).
HEALTH_SCHEMA = (
    "batch_id long, family string, rows_in long, rows_out long, drift double"
)


def record_health(
    spark: SparkSession,
    warehouse: str,
    batch_id: int,
    family: str,
    rows_in: int,
    rows_out: int,
    drift: float | None = None,
) -> None:
    """Append one observability row to the warehouse's ``service_health``
    table. Driver-side single-row create on purpose: the counts are
    already computed scalars and a one-row append per (batch, family) is
    geometry-bounded at any data scale — never proportional to batch
    contents."""
    spark.createDataFrame(
        [(int(batch_id), family, int(rows_in), int(rows_out),
          None if drift is None else float(drift))],
        HEALTH_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(os.path.join(warehouse, HEALTH_TABLE))


def stream_name_from_subject_col():
    """Route each message to its raw table by the 2nd subject segment —
    ``globex.supprt.>`` -> ``supprt`` (nats.yml:8-10). Fixes reference quirk
    K2 (main.go:154 hardcodes one table)."""
    from go_nats_to_clickhouse_spark.functions.clickhouse import ch_split_element

    return ch_split_element("subject", 2)


@dataclass
class PipelineTables:
    warehouse: str

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)


def _split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid rows vs dead-letter rows (malformed: missing ts/seq/subject)."""
    ok = F.col("timestamp").isNotNull() & F.col("sequence").isNotNull() & F.col(
        "subject"
    ).isNotNull()
    valid = df.filter(ok)
    dead = df.filter(~ok).select(
        F.col("timestamp"),
        F.col("subject"),
        F.lit("missing jetstream metadata").alias("error"),
        F.to_json(F.struct("*")).alias("raw"),
    )
    return valid, dead


def apply_cascade(
    batch: DataFrame,
    tables: PipelineTables,
    idempotent: bool = False,
    write_partitions: int = 4,
    collect_counts: bool = True,
) -> dict[str, int]:
    """Apply one micro-batch through the full cascade; returns row counts.

    Used by both the streaming foreachBatch and batch backfills — identical
    semantics either way (Spark's batch/streaming unification).

    ``idempotent=True`` upgrades the at-least-once contract to effective
    exactly-once: the batch is deduplicated on the (subject, sequence)
    idempotency key both within itself and against rows already persisted
    in the union table for the batch's months. The existing-key read is
    bounded by ym partition pruning, so the check scans only the partitions
    this batch touches — at one month of hot data that is a single
    partition regardless of table history. (The reference accepts
    duplicates on redelivery — main.go:122-127; this is the documented
    upgrade path, off by default for parity.)
    """
    # Micro-batches are admission-controlled (<= batch_size rows), so writing
    # from the source's full partition count sprays tiny files (tasks x
    # hive-partitions per table per trigger) and pays commit overhead per
    # file. Repartitioning the small batch is cheap and bounds file count;
    # raise write_partitions for high-volume deployments.
    batch = batch.repartition(write_partitions)
    valid, dead = _split_valid(batch)
    snapshotted = False
    if idempotent:
        valid = valid.dropDuplicates(["subject", "sequence"])
        dest = tables.path(ALL_STREAMS_TABLE)
        if os.path.exists(dest):
            months = [
                r[0]
                for r in layout.with_partition_col(valid)
                .select(layout.PARTITION_COL)
                .distinct()
                .collect()  # few distinct months per batch — driver-safe
            ]
            existing = (
                layout.read_table(batch.sparkSession, dest)
                .filter(F.col(layout.PARTITION_COL).isin(months))
                .select("subject", "sequence")
            )
            # The anti-join's plan SCANS the union table this cascade is
            # about to append to, and Spark drops any cached plan that
            # reads a path the moment that path is written
            # (CacheManager.uncacheByPath on insert). A plain persist()
            # here is therefore silently invalidated by the union append,
            # and the analytics write would re-run the anti-join against
            # the NEW file listing — filtering this batch's own
            # freshly-landed rows away (observed: analytics lost every
            # batch after the first). localCheckpoint cuts the lineage to
            # a block-manager snapshot with no path dependency, so all
            # three sinks write exactly the same row set.
            valid = valid.join(
                existing, ["subject", "sequence"], "left_anti"
            ).localCheckpoint(eager=True)
            snapshotted = True
    # One pass over the batch feeds three tables; cache so the (small,
    # admission-controlled) batch isn't recomputed per sink.
    if not snapshotted:
        valid = valid.persist()
    try:
        counts: dict[str, int] = {}
        raw = message_to_raw(valid).withColumn("stream", stream_name_from_subject_col())
        # Per-stream raw tables (init.sql:8-32): one write partitioned by the
        # derived stream column — N streams land in N directories from a
        # single job instead of N sequential jobs.
        raw_out = layout.with_partition_col(raw).sortWithinPartitions(
            *layout.SORT_KEYS["raw"]
        )
        raw_out.write.mode("append").options(
            **layout.bloom_options(layout.BLOOM_KEYS["raw"])
        ).partitionBy("stream", layout.PARTITION_COL).parquet(
            tables.path(RAW_TABLE_PREFIX.rstrip("_"))
        )
        raw_plain = raw.drop("stream")
        counts["raw"] = valid.count() if collect_counts else -1
        # Union table (init.sql:35-46): identical rows, one flat table.
        layout.write_partitioned(
            raw_plain,
            tables.path(ALL_STREAMS_TABLE),
            layout.SORT_KEYS["all_streams"],
            bloom_cols=layout.BLOOM_KEYS["all_streams"],
        )
        # Analytics table (init.sql:74-121): the MV projection.
        layout.write_partitioned(
            analytics_projection(raw_plain),
            tables.path(ANALYTICS_TABLE),
            layout.SORT_KEYS["analytics"],
            bloom_cols=layout.BLOOM_KEYS["analytics"],
        )
        # isEmpty short-circuits (take-1), so the common no-dead-letter path
        # costs one cheap probe instead of a counting pass.
        if dead.isEmpty():
            counts["dead_letter"] = 0
        else:
            dead.write.mode("append").parquet(tables.path(DEAD_LETTER_TABLE))
            counts["dead_letter"] = dead.count() if collect_counts else -1
        return counts
    finally:
        if not snapshotted:
            valid.unpersist()


def start_pipeline(
    spark: SparkSession,
    cfg: EngineConfig,
    source_df: DataFrame,
    query_name: str = "gntcs-ingest",
    idempotent: bool = False,
    trigger_seconds: float | None = None,
) -> StreamingQuery:
    """Start the ingestion query over any streaming DataFrame with
    MESSAGE_SCHEMA columns (NATS source, file source, or a test source).

    Default cadence is the reference's 5-second time trigger
    (cfg.batch_timeout_seconds); pass ``trigger_seconds=0`` for
    back-to-back batches (used by :func:`run_backfill`).
    """
    tables = PipelineTables(cfg.warehouse_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # steady-state ingest skips the per-batch counting jobs
        apply_cascade(batch_df, tables, idempotent=idempotent, collect_counts=False)

    seconds = cfg.batch_timeout_seconds if trigger_seconds is None else trigger_seconds
    return (
        source_df.writeStream.queryName(query_name)
        .foreachBatch(_process)
        .option("checkpointLocation", os.path.join(cfg.checkpoint_dir, query_name))
        .trigger(processingTime=f"{seconds} seconds")
        .start()
    )


#: document payload fields as they ride inside a message's ``data`` JSON
#: (the document-bearing message contract: a corpus doc published to the
#: broker is one envelope whose data JSON carries these fields).
DOC_PAYLOAD_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def docs_from_messages(batch: DataFrame) -> DataFrame:
    """Extract document rows from a micro-batch of MESSAGE_SCHEMA rows:
    parse each message's ``data`` JSON against the document payload
    contract and keep the rows that carry one (doc_id present). Pure
    column expressions (from_json is permissive — a non-document payload
    yields nulls, never a crash), so the extraction is a narrow map-side
    stage on the already-admitted batch."""
    return (
        batch.filter(F.col("data").isNotNull())
        .select(F.from_json("data", DOC_PAYLOAD_SCHEMA).alias("d"))
        .select("d.*")
        .filter(F.col("doc_id").isNotNull())
    )


#: embedding payload fields inside a message's ``data`` JSON
VEC_PAYLOAD_SCHEMA = "vec_id long, embedding array<double>"


def vecs_from_messages(batch: DataFrame) -> DataFrame:
    """Extract (neighbor_id, cv) embedding rows from a micro-batch of
    MESSAGE_SCHEMA rows — the vector twin of :func:`docs_from_messages`
    (document payloads parse to null vec_id/embedding and drop out, and
    vice versa, so mixed-payload streams route themselves)."""
    return (
        batch.filter(F.col("data").isNotNull())
        .select(F.from_json("data", VEC_PAYLOAD_SCHEMA).alias("v"))
        .select("v.*")
        .filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        )
    )


def start_ingest_service(
    spark: SparkSession,
    cfg: EngineConfig,
    source_df: DataFrame,
    index_root: str,
    ann_tables: dict[str, str] | None = None,
    drift_limit: float = 2.0,
    query_name: str = "gntcs-service",
    idempotent: bool = True,
    trigger_seconds: float | None = None,
    health: bool = True,
) -> StreamingQuery:
    """The COMPOSED service lifecycle — the reference's actual
    architecture in one checkpointed run: messages arrive (NATS source or
    envelope file replay), every micro-batch feeds BOTH the
    raw/union/analytics MV cascade (:func:`apply_cascade` — the
    insert-triggered views of init.sql:49-121 firing on main.go:154's
    INSERT) AND the LLM-pipeline index maintainers
    (plans/materialize.append_batch_index — the same insert-triggered
    contract applied to the signature/band/quality tables). One source,
    one checkpoint, one commit point: a crash replays the whole epoch
    into both sinks, so the two halves can never drift apart by more
    than one batch, and the downstream manifest consumer (duplicate-
    invariant, queries/pipeline_mat.kept_docs_from) absorbs the replay.

    ``idempotent=True`` (the default here — this is the upgraded
    exactly-once service config) dedups the cascade on (subject,
    sequence); the index side needs no such key because every consumer
    is duplicate-invariant by construction.

    With ``ann_tables`` given, embedding-bearing messages
    (:func:`vecs_from_messages`) additionally feed the ANN maintainer
    (plans/materialize.append_ann_batch) against the frozen
    centroids/codebooks — the THIRD sink family of the same epoch, with
    the pre-append drift guard (``drift_limit``) fail-stopping the
    stream before an out-of-distribution batch lands. Scale shape: all
    sink families are append-only partition-parallel writes over the
    same admitted batch, persisted once and reused.

    ``health=True`` (default) additionally appends one ``service_health``
    row per (batch, sink family) under the warehouse — batch id, rows
    presented, rows appended, and the ANN drift-guard ratio — the
    queryable analog of the reference's per-insert slog banner
    (main.go:169-171) and ClickHouse's system tables (VERDICT r7 #7).
    The counting actions run over the already-persisted batch; pass
    ``health=False`` for benchmark-critical deployments that want the
    reference's count-free hot path."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        append_ann_batch,
        append_batch_index,
    )

    tables = PipelineTables(cfg.warehouse_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()  # the sink families share this batch
        spark_b = batch_df.sparkSession
        try:
            counts = apply_cascade(
                batch_df, tables, idempotent=idempotent, collect_counts=health
            )
            if health:
                # rows_in derives from the counts the cascade already
                # collected (valid appended + dead-lettered) — no extra
                # count() job on the batch (ADVICE r8). Idempotent-dedup
                # drops are invisible here by construction: health
                # records what the sink admitted, and a replayed epoch's
                # rows were admitted in their original batch.
                n_msgs = counts["raw"] + counts["dead_letter"]
                if n_msgs:
                    record_health(
                        spark_b, cfg.warehouse_dir, batch_id, "cascade",
                        n_msgs, counts["raw"],
                    )
            docs = docs_from_messages(batch_df)
            n_docs = docs.count() if health else (0 if docs.isEmpty() else -1)
            if n_docs:
                append_batch_index(docs, index_root, is_new=True)
                if health:
                    record_health(
                        spark_b, cfg.warehouse_dir, batch_id, "doc_index",
                        n_docs, n_docs,
                    )
            if ann_tables is not None:
                vecs = vecs_from_messages(batch_df)
                n_vecs = vecs.count() if health else (0 if vecs.isEmpty() else -1)
                if n_vecs:
                    drift = append_ann_batch(
                        spark_b,
                        vecs,
                        ann_tables,
                        drift_limit=drift_limit,
                    )
                    if health:
                        record_health(
                            spark_b, cfg.warehouse_dir, batch_id, "ann",
                            n_vecs, n_vecs, drift=drift,
                        )
        finally:
            batch_df.unpersist()

    seconds = cfg.batch_timeout_seconds if trigger_seconds is None else trigger_seconds
    return (
        source_df.writeStream.queryName(query_name)
        .foreachBatch(_process)
        .option("checkpointLocation", os.path.join(cfg.checkpoint_dir, query_name))
        .trigger(processingTime=f"{seconds} seconds")
        .start()
    )


def run_backfill(
    spark: SparkSession,
    cfg: EngineConfig,
    source_df: DataFrame,
    query_name: str = "gntcs-backfill",
    idempotent: bool = False,
) -> None:
    """Drain-and-stop catch-up: process everything the source currently has
    in admission-controlled micro-batches (maxRecordsPerTrigger still
    bounds each one), then terminate.

    Implemented as a zero-interval query drained with
    ``processAllAvailable`` rather than ``trigger(availableNow=True)``:
    Spark's availableNow wrapper snapshots a Python data source's
    ``latestOffset`` once, which under admission control means a single
    clamped batch — observed live, not just theorized. This form iterates
    until the source reports no new offsets.
    """
    q = start_pipeline(
        spark,
        cfg,
        source_df,
        query_name=query_name,
        idempotent=idempotent,
        trigger_seconds=0,
    )
    stop_gracefully(q)


def stop_gracefully(query: StreamingQuery, timeout_seconds: float = 60.0) -> None:
    """Flush-on-shutdown (ref main.go:138-147): drain everything the source
    has admitted, then stop.

    ``StreamingQuery.stop()`` alone *interrupts* an in-flight micro-batch —
    the Spark analog of dropping the buffer, which the reference explicitly
    avoids. ``processAllAvailable()`` first blocks until the sink has
    processed everything available, so the final batch commits before the
    trigger thread is torn down (at-least-once preserved either way via
    checkpoint replay; this avoids the pointless replay).
    """
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout_seconds)
