"""Bucketized range join: equivalence vs the naive nested-loop join,
boundary semantics, multi-bucket intervals, and plan shape (no
BroadcastNestedLoopJoin / CartesianProduct)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.range_join import range_join


def _points(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(
        [0, 59, 60, 61, 119, 120, 500, 3600, 7199, 7200]
    )]
    return spark.createDataFrame(rows, "pid long, pts timestamp")


def _intervals(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (100, base, base + dt.timedelta(seconds=60)),            # [0, 60)
        (101, base + dt.timedelta(seconds=60), base + dt.timedelta(seconds=120)),
        (102, base, base + dt.timedelta(seconds=7200)),          # spans many buckets
        (103, base + dt.timedelta(seconds=500), base + dt.timedelta(seconds=500)),  # empty (half-open)
        (104, base + dt.timedelta(seconds=900), base + dt.timedelta(seconds=400)),  # end < start
    ]
    return spark.createDataFrame(rows, "iid long, istart timestamp, iend timestamp")


def _naive(points, intervals, closed):
    ge = F.col("pts") >= F.col("istart") if closed in ("left", "both") else F.col("pts") > F.col("istart")
    lt = F.col("pts") <= F.col("iend") if closed in ("right", "both") else F.col("pts") < F.col("iend")
    return points.crossJoin(intervals).filter(ge & lt)


@pytest.mark.parametrize("closed", ["left", "right", "both", "neither"])
@pytest.mark.parametrize("width", [30, 60, 900, 10_000])
def test_matches_nested_loop_all_closed_modes(spark, closed, width):
    points, intervals = _points(spark), _intervals(spark)
    got = range_join(
        points, intervals,
        point="pts", start="istart", end="iend",
        bucket_width=width, closed=closed,
    )
    want = _naive(points, intervals, closed)
    key = lambda df: sorted(tuple(r) for r in df.select("pid", "iid").collect())
    assert key(got) == key(want), f"closed={closed} width={width}"


def test_half_open_boundaries(spark):
    # point exactly at start is IN ([start,end)); exactly at end is OUT.
    points, intervals = _points(spark), _intervals(spark)
    pairs = {
        (r.pid, r.iid)
        for r in range_join(
            points, intervals,
            point="pts", start="istart", end="iend", bucket_width=60,
        ).collect()
    }
    assert (0, 100) in pairs      # pts == istart
    assert (2, 100) not in pairs  # pts == iend (60s)
    assert (2, 101) in pairs      # same instant opens the next interval


def test_interval_spanning_many_buckets(spark):
    # width 30 → the 7200 s interval explodes to 241 bucket rows but still
    # matches exactly the points inside it.
    points, intervals = _points(spark), _intervals(spark)
    hits = (
        range_join(
            points, intervals.filter(F.col("iid") == 102),
            point="pts", start="istart", end="iend", bucket_width=30,
        )
        .select("pid")
        .collect()
    )
    assert sorted(r.pid for r in hits) == [0, 1, 2, 3, 4, 5, 6, 7, 8]  # 7200 excluded


def test_degenerate_intervals_never_match(spark):
    points, intervals = _points(spark), _intervals(spark)
    got = range_join(
        points, intervals.filter(F.col("iid").isin(103, 104)),
        point="pts", start="istart", end="iend", bucket_width=60,
    )
    assert got.count() == 0


def test_numeric_domain_and_extra_equi_keys(spark):
    points = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 15.0), (3, "b", 5.0)], "pid long, pk string, x double"
    )
    intervals = spark.createDataFrame(
        [(10, "a", 0.0, 10.0), (11, "b", 0.0, 10.0)], "iid long, ik string, lo double, hi double"
    )
    got = range_join(
        points, intervals,
        point="x", start="lo", end="hi", bucket_width=4.0,
        equi=[("pk", "ik")],
    )
    assert sorted((r.pid, r.iid) for r in got.collect()) == [(1, 10), (3, 11)]


def test_rejects_overlapping_columns_and_bad_closed(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="disjoint"):
        range_join(df, df, point="x", start="x", end="x", bucket_width=1)
    other = spark.createDataFrame([(1, 2)], "lo long, hi long")
    with pytest.raises(ValueError, match="closed"):
        range_join(df, other, point="x", start="lo", end="hi", bucket_width=1, closed="open")


def test_occupancy_guard_adapts_width_on_degenerate_span(spark):
    # A time axis 1000x more compressed than the caller assumed (the round-2
    # fixture-drift failure mode): all points within 7.2 s, caller asks for
    # 900 s buckets => every row in ~1 bucket. With min_buckets the width
    # shrinks, results stay identical to the naive join, and the bucket
    # column actually spreads.
    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(i, base + dt.timedelta(milliseconds=7 * i)) for i in range(1000)],
        "pid long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100 + j, base + dt.timedelta(milliseconds=700 * j),
             base + dt.timedelta(milliseconds=700 * j + 350))
            for j in range(10)
        ],
        "iid long, istart timestamp, iend timestamp",
    )
    with pytest.warns(UserWarning, match="shrinking width"):
        got = range_join(
            points, intervals,
            point="pts", start="istart", end="iend",
            bucket_width=900, closed="left", min_buckets=64,
        )
    want = _naive(points, intervals, "left")
    key = lambda df: sorted(tuple(r) for r in df.select("pid", "iid").collect())
    assert key(got) == key(want)


def test_occupancy_guard_noop_on_healthy_span(spark):
    # Healthy axis: span/width >= min_buckets, so no warning and identical
    # results with and without the guard.
    points, intervals = _points(spark), _intervals(spark)
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")  # any warning -> test failure
        got = range_join(
            points, intervals,
            point="pts", start="istart", end="iend",
            bucket_width=60, closed="left", min_buckets=32,
        )
        n = got.count()
    base = range_join(
        points, intervals,
        point="pts", start="istart", end="iend",
        bucket_width=60, closed="left",
    )
    assert n == base.count()


def test_plan_is_equi_join_not_nested_loop(spark):
    points, intervals = _points(spark), _intervals(spark)
    plan = range_join(
        points, intervals,
        point="pts", start="istart", end="iend", bucket_width=60,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
