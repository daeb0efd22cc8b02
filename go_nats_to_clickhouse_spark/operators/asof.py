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
    Ties inside the right side resolve to the row latest in (on, struct)
    order — deterministic for distinct timestamps per key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
