"""Stream-stream and stream-static joins (SURVEY.md §2.7 streaming row).

Stream-stream equi-joins in Structured Streaming require watermarks on both
sides plus a time-bound between the two event times — that bound is what
lets the state store evict rows, keeping state finite on an unbounded
stream. Without it, state grows forever; with it, state per key is bounded
by (watermark delay + join window), independent of stream length — the
property that matters at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.hints import bounded


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "chat_id",
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join two message streams on ``key`` where the right event happens
    within [left_ts, left_ts + within] — e.g. correlate a request stream
    with its response stream per chat.

    Output: key, left/right timestamps+sequences, lag_seconds.
    """
    lw = left.withWatermark(left_ts, watermark).select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("l_ts"),
        F.col("sequence").alias("l_seq"),
    )
    rw = right.withWatermark(right_ts, watermark).select(
        F.col(key).alias("rk"),
        F.col(right_ts).alias("r_ts"),
        F.col("sequence").alias("r_seq"),
    )
    cond = (
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return (
        lw.join(rw, cond, "inner")
        .select(
            F.col("k").alias(key),
            "l_ts",
            "l_seq",
            "r_ts",
            "r_seq",
            (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("lag_seconds"),
        )
    )


def enrich_with_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich each message with a (broadcast) dimension
    table — no state, no watermark needed; the dim is re-resolved per
    micro-batch so slowly-changing dimensions pick up updates."""
    return stream.join(
        F.broadcast(bounded(dim, "stream-enrich dimension: in-RAM by contract")),
        on,
        "left",
    )
