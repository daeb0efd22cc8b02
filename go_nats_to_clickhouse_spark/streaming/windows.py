"""Streaming windowed / stateful operators (SURVEY.md §2.7 streaming row).

The reference's only streaming operators are count/time micro-batching;
these are the query-surface streaming operators a real engine adds on top,
each expressed with the built-in Structured Streaming primitives so state
lives in the (RocksDB-backed, at scale) state store — never on the driver:

* tumbling / sliding window aggregations with event-time watermarks,
* session windows (inactivity gap),
* streaming deduplication within a watermark,
* an ``applyInPandasWithState`` custom stateful operator (running per-key
  counters with timeout-based emission) as the template for operators the
  built-ins can't express.

All functions take and return DataFrames, so the same code runs in batch
tests (where watermarks are ignored) and against any streaming source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
    key_col: str | None = None,
) -> DataFrame:
    """Tumbling event-time window counts with a late-data watermark."""
    keys = [F.window(ts_col, window).alias("w")] + (
        [F.col(key_col)] if key_col else []
    )
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *([F.col(key_col)] if key_col else []),
            "n",
        )
    )


def sliding_counts(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding (hopping) window counts — each event lands in
    window/slide overlapping windows."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "chat_id",
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows keyed by ``key_col`` with an inactivity gap."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n",
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: tuple[str, ...] = ("subject", "sequence"),
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on (subject, sequence) — the idempotency key
    the at-least-once pipeline exposes (SURVEY.md §2.6 K3): turns the
    reference's possible-duplicates contract into effective exactly-once
    for downstream consumers, with state bounded by the watermark."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stateful_user_counters(
    df: DataFrame,
    key_col: str = "chat_id",
    ts_col: str = "timestamp",
    timeout_minutes: float = 30,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running message count + last-seen timestamp, emitted when the key goes
    quiet for ``timeout_minutes`` (processing-time timeout).

    Template for semantics the built-in windows can't express (e.g.
    conversation-level rollups in the reference's chat domain). State is
    per-key and partition-distributed — nothing accumulates on the driver.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("n_messages", LongType()),
            StructField("last_seen", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("last_us", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, last_us = state.get if state.exists else (0, 0)
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_messages": [n],
                    "last_seen": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                last_us = max(
                    last_us, int(pdf[ts_col].max().value // 1000)
                )
        state.update((n, last_us))
        state.setTimeoutDuration(int(timeout_minutes * 60 * 1000))
        yield pd.DataFrame({"key": [], "n_messages": [], "last_seen": []})

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def running_totals_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    eid_col: str = "event_id",
) -> DataFrame:
    """Deterministic ``applyInPandasWithState`` operator: per-key running
    totals, one emitted row per micro-batch in which the key appears —
    (key, n_total, max_eid, n_batches) with the CUMULATIVE values after
    that batch.

    Unlike :func:`stateful_user_counters` (processing-time timeout —
    correct production shape, but wall-clock-dependent emission), every
    output here is a pure function of the batch split, so a finite
    controlled replay is hash-checkable against a batch oracle
    (queries/streaming.streaming_stateful_running_counts). State is
    per-key in the state store, partition-distributed; at scale this is
    the running-aggregate shape (per-entity counters, feature freshness
    trackers) the built-in windowed aggs can't express."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("n_total", LongType()),
            StructField("max_eid", LongType()),
            StructField("n_batches", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("mx", LongType()),
            StructField("nb", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, mx, nb = state.get if state.exists else (0, 0, 0)
        added = 0
        m = 0
        for pdf in pdfs:
            added += len(pdf)
            if len(pdf):
                m = max(m, int(pdf[eid_col].max()))
        # NoTimeout => update() is only invoked for keys WITH rows in the
        # current micro-batch, so added >= 1 here by construction
        n += added
        mx = max(mx, m)
        nb += 1
        state.update((n, mx, nb))
        yield pd.DataFrame(
            {"key": [int(key[0])], "n_total": [n], "max_eid": [mx], "n_batches": [nb]}
        )

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
