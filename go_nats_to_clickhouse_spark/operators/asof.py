"""General as-of join: for each left row, the nearest right row at or
before (backward) / at or after (forward) its timestamp, per key.

Spark has no native as-of join; the scalable form used here is the
merged-stream trick (the same one queries/relational.join_asof_last_click
pins): union both sides into one time-ordered stream per key, carry the
most recent right row forward (or the next one backward) with a window
``last(..., ignorenulls)`` — ONE shuffle on the key, no join operator at
all, no per-row subquery. pandas.merge_asof does the same sweep
single-node; tests assert equivalence against it.

Right-side columns ride the stream packed into a single struct column,
so the operator works for arbitrary right schemas without column-name
gymnastics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_seconds: int | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Left as-of join. Output = left columns + each right column prefixed
    with ``right_prefix`` (NULL when no match / outside tolerance).

    direction='backward': match the latest right row with
    ``right.on <= left.on`` (``<`` when strict). 'forward': earliest
    right row with ``right.on >= left.on`` (``>`` when strict).
    'nearest': whichever of those two candidates has the smaller absolute
    time gap (microsecond precision); an exact gap tie resolves backward.
    Ties inside the right side resolve to the row latest in (on, struct)
    order — deterministic for distinct timestamps per key.

    'nearest' runs BOTH sweeps over the one merged stream — still a single
    shuffle on the key (two window sorts of the same partitioning), never
    a join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, by, strict, tolerance_seconds, right_prefix
        )
    keys = [by] if by else []
    l_tag = left.select(
        *keys, F.col(on).alias("_t"), F.lit(0).alias("_is_r"), F.struct(*left.columns).alias("_l"), F.lit(None).cast(
            right.select(F.struct(*right.columns).alias("s")).schema["s"].dataType
        ).alias("_r")
    )
    r_tag = right.select(
        *keys, F.col(on).alias("_t"), F.lit(1).alias("_is_r"), F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"), F.struct(*right.columns).alias("_r")
    )
    merged = l_tag.unionByName(r_tag)

    # Tie order decides visibility at equal timestamps: inclusive sweeps
    # the right row BEFORE the left row so last() sees it, strict sweeps
    # it after. The sweep direction flips for forward joins but the tie
    # rule does not — visibility at equal _t is the same question either
    # way (tie.desc() ranks _is_r independently of the _t ordering).
    asc = direction == "backward"
    tie = F.col("_is_r") if not strict else -F.col("_is_r")
    order = [F.col("_t").asc(), tie.desc()] if asc else [F.col("_t").desc(), tie.desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        "_m", F.last(F.when(F.col("_is_r") == 1, F.col("_r")), ignorenulls=True).over(w)
    ).filter(F.col("_is_r") == 0)

    if tolerance_seconds is not None:
        gap: Column = F.abs(
            F.unix_timestamp(F.col("_t")) - F.unix_timestamp(F.col(f"_m.{on}"))
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= tolerance_seconds, F.col("_m"))
        )

    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return matched.select(*out_cols)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None,
    strict: bool,
    tolerance_seconds: int | None,
    right_prefix: str,
) -> DataFrame:
    """direction='nearest': the backward and forward sweeps share one
    merged stream (one shuffle on the key; the two windows sort the same
    partitions in opposite directions), then each left row keeps the
    candidate with the smaller absolute gap — exact tie goes backward."""
    keys = [by] if by else []
    r_struct_t = right.select(F.struct(*right.columns).alias("s")).schema[
        "s"
    ].dataType
    l_struct_t = left.select(F.struct(*left.columns).alias("s")).schema[
        "s"
    ].dataType
    l_tag = left.select(
        *keys,
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_r"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r_tag = right.select(
        *keys,
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_r"),
        F.lit(None).cast(l_struct_t).alias("_l"),
        F.struct(*right.columns).alias("_r"),
    )
    merged = l_tag.unionByName(r_tag)
    tie = F.col("_is_r") if not strict else -F.col("_is_r")
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), tie.desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").desc(), tie.desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r_vis = F.when(F.col("_is_r") == 1, F.col("_r"))
    matched = (
        merged.withColumn("_mb", F.last(r_vis, ignorenulls=True).over(wb))
        .withColumn("_mf", F.last(r_vis, ignorenulls=True).over(wf))
        .filter(F.col("_is_r") == 0)
    )
    gap_b = F.abs(
        F.unix_micros(F.col("_t")) - F.unix_micros(F.col(f"_mb.{on}"))
    )
    gap_f = F.abs(
        F.unix_micros(F.col("_t")) - F.unix_micros(F.col(f"_mf.{on}"))
    )
    matched = matched.withColumn(
        "_m",
        F.when(F.col("_mb").isNull(), F.col("_mf"))
        .when(F.col("_mf").isNull(), F.col("_mb"))
        .when(gap_f < gap_b, F.col("_mf"))
        .otherwise(F.col("_mb")),
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("_t")) - F.unix_micros(F.col(f"_m.{on}"))
        )
        matched = matched.withColumn(
            "_m",
            F.when(gap <= tolerance_seconds * 1_000_000, F.col("_m")),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return matched.select(*out_cols)
