"""Bucketized point-in-interval range join.

The reference delegates ad-hoc joins to ClickHouse SQL (SURVEY.md §2.7 —
no joins in main.go/init.sql); an interval/range join is part of the query
surface we commit to natively. Spark has no range-join optimization: a
plain ``left.join(right, (point >= start) & (point < end))`` has no equi
condition, so Catalyst picks BroadcastNestedLoopJoin (O(n·m) and
driver-memory-bound) or, without a broadcastable side, a cartesian
product. Both are scale-killers at 100 TB.

The classic fix (same trick Databricks' range-join hint and KDB's window
joins use) is to discretize time into fixed-width buckets:

- each point row gets one bucket: ``floor(point / W)``
- each interval row is exploded to every bucket it overlaps:
  ``sequence(floor(start / W), floor(end / W))``
- equi-join on the bucket id (plus optional extra equi keys), then apply
  the exact range predicate as a post-join filter.

The plan becomes a shuffle equi-join (sort-merge or shuffled-hash, AQE's
choice) partitioned by bucket — embarrassingly parallel, no driver
involvement, and the shuffle width is bounded by ``span/W + 1`` exploded
rows per interval. Pick ``bucket_width`` on the order of the typical
interval length: W too small explodes long intervals into many buckets;
W too large puts unrelated rows in one bucket and shifts work to the
post-filter. Both stay *correct* — only the constant factor moves.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join", "interval_join"]


def _bucket(col: Column, width: float) -> Column:
    # cast("double") maps timestamps to fractional epoch seconds and
    # passes numerics through, so one expression serves both; floor is
    # consistent between the point side and the interval side because
    # both go through the same cast.
    return F.floor(col.cast("double") / F.lit(float(width))).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    bucket_width: float,
    closed: str = "left",
    equi: list[tuple[str, str]] | None = None,
    min_buckets: int | None = None,
) -> DataFrame:
    """Join ``left`` rows whose ``point`` falls inside ``right``'s
    ``[start, end]`` interval, as a bucketed equi-join.

    closed: which interval ends admit equality — "left" ([start, end)),
    "right" ((start, end]), "both" ([start, end]), "neither".
    equi: optional extra equi-key pairs ``(left_col, right_col)`` ANDed
    into the join; they tighten the shuffle partitioning for free.
    min_buckets: occupancy guard. When set, probe the point column's span
    (one column-pruned min/max agg — parquet footer stats make it cheap)
    and, if ``span / bucket_width`` would yield fewer buckets than this,
    shrink the width to ``span / min_buckets``. A time axis that is far
    more compressed than the caller assumed (skewed ingest, fixture drift,
    clock-unit bugs) then degrades to a narrower-bucket equi-join instead
    of collapsing every row into ~1 bucket and going quadratic inside it.
    Any positive width is *correct* — only the constant factor moves — so
    the guard never changes results. The shrink is itself fan-out-capped:
    each right-side interval explodes into ``(end-start)/width`` bucket
    rows, so a width adapted to the *point* axis alone could multiply the
    build side by orders of magnitude when the interval axis is not
    equally compressed; the adapted width is clamped to
    ``max(end-start) / 64`` (≤64 bucket rows per interval). NOTE: the
    guard runs one or two small eager Spark jobs (point-span min/max and,
    on shrink, interval max-length) at plan-CONSTRUCTION time — callers
    building plans they never execute pay it anyway; pass
    ``min_buckets=None`` on hot construction paths that are known sane.

    Column names must be disjoint between the two sides (alias before
    calling) — the result carries all columns from both.
    """
    if closed not in ("left", "right", "both", "neither"):
        raise ValueError(f"closed must be left/right/both/neither, got {closed!r}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; shared: {sorted(overlap)}")

    if min_buckets is not None and min_buckets > 0:
        lo, hi = left.select(
            F.min(F.col(point).cast("double")), F.max(F.col(point).cast("double"))
        ).first()
        if lo is not None and hi is not None and hi > lo:
            span = hi - lo
            if span / bucket_width < min_buckets:
                adapted = span / min_buckets
                # Fan-out cap: shrinking the width multiplies every right
                # interval's bucket-row count; clamp so no interval explodes
                # into more than 64 bucket rows, even if that leaves fewer
                # than min_buckets point buckets (a partially-degenerate
                # axis beats an exploded build side).
                max_ival = right.select(
                    F.max(F.col(end).cast("double") - F.col(start).cast("double"))
                ).first()[0]
                if max_ival is not None and max_ival > 0:
                    adapted = max(adapted, max_ival / 64.0)
                if adapted < bucket_width:
                    warnings.warn(
                        f"range_join: point span {span:.3g}s yields only "
                        f"{span / bucket_width:.1f} buckets at width "
                        f"{bucket_width:g}; shrinking width to {adapted:.3g} "
                        f"(target {min_buckets} buckets, interval fan-out "
                        "capped at 64)",
                        stacklevel=2,
                    )
                    bucket_width = adapted

    lb, rb = "__rj_bucket_l", "__rj_bucket_r"
    lhs = left.withColumn(lb, _bucket(F.col(point), bucket_width))
    # Degenerate intervals (end before start — or equal, for half/fully
    # open) can never match; drop them BEFORE sequence(), which would
    # otherwise happily generate a *descending* bucket list.
    nonempty = (
        F.col(start) <= F.col(end) if closed == "both" else F.col(start) < F.col(end)
    )
    rhs = (
        right.filter(nonempty)
        .withColumn(
            rb,
            F.explode(
                F.sequence(
                    _bucket(F.col(start), bucket_width),
                    _bucket(F.col(end), bucket_width),
                )
            ),
        )
    )

    ge = F.col(point) >= F.col(start) if closed in ("left", "both") else F.col(point) > F.col(start)
    lt = F.col(point) <= F.col(end) if closed in ("right", "both") else F.col(point) < F.col(end)
    cond = (F.col(lb) == F.col(rb)) & ge & lt
    for lcol, rcol in equi or []:
        cond = cond & (F.col(lcol) == F.col(rcol))
    return lhs.join(rhs, cond, "inner").drop(lb, rb)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    equi: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Interval x interval OVERLAP join (half-open: ``[s, e)`` sides
    overlap iff ``sa < eb AND sb < ea``), as a bucketed equi-join — the
    second range-join shape a pipeline needs (point-in-interval is
    :func:`range_join`).

    Both sides explode to the buckets they cover; the equi-join on the
    bucket id makes the plan a shuffle join partitioned by time bucket.
    De-duplication is FREE: a pair overlapping k shared buckets would
    match k times, so the join keeps only the match in the FIRST bucket
    both cover — ``bucket == floor(max(sa, sb) / W)`` — and every
    overlapping pair survives exactly once with no distinct shuffle.

    Column names must be disjoint between the two sides (alias before
    calling) — the result carries all columns from both.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; shared: {sorted(overlap)}")
    lb, rb = "__ij_bucket_l", "__ij_bucket_r"

    def explode_buckets(df: DataFrame, s: str, e: str, out: str) -> DataFrame:
        return df.filter(F.col(s) < F.col(e)).withColumn(
            out,
            F.explode(
                F.sequence(
                    _bucket(F.col(s), bucket_width),
                    _bucket(F.col(e), bucket_width),
                )
            ),
        )

    lhs = explode_buckets(left, left_start, left_end, lb)
    rhs = explode_buckets(right, right_start, right_end, rb)
    cond = F.col(lb) == F.col(rb)
    for lc, rc in equi or []:
        cond = cond & (F.col(lc) == F.col(rc))
    sa, ea = F.col(left_start), F.col(left_end)
    sb, eb = F.col(right_start), F.col(right_end)
    first_shared = _bucket(F.greatest(sa, sb), bucket_width)
    return (
        lhs.join(rhs, cond)
        .filter((sa < eb) & (sb < ea) & (F.col(lb) == first_shared))
        .drop(lb, rb)
    )
