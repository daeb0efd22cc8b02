"""asof_join equivalence against pandas.merge_asof — backward/forward,
strict/inclusive, with and without tolerance, random data, fixed seed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datetime import datetime


def _random_frames(seed: int, n_left: int = 200, n_right: int = 150):
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2000-01-01")
    left = pd.DataFrame(
        {
            "lid": np.arange(n_left),
            "key": rng.randint(0, 5, n_left),
            "ts": base + pd.to_timedelta(rng.randint(0, 100_000, n_left), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(n_right),
            "key": rng.randint(0, 5, n_right),
            "ts": base + pd.to_timedelta(rng.randint(0, 100_000, n_right), unit="s"),
            "val": rng.randn(n_right).round(6),
        }
    )
    # distinct timestamps per (key, side-role) keep expected output unique
    left = left.drop_duplicates(["key", "ts"]).reset_index(drop=True)
    right = right.drop_duplicates(["key", "ts"]).reset_index(drop=True)
    return left, right


def _expected(left, right, direction, tolerance=None):
    out = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "r_ts"}),
        left_on="ts",
        right_on="r_ts",
        by="key",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
        allow_exact_matches=True,
    )
    return {
        (int(r.lid)): (None if pd.isna(r.rid) else int(r.rid)) for r in out.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 3600])
def test_asof_matches_pandas(spark, direction, tolerance):
    from go_nats_to_clickhouse_spark.operators.asof import asof_join

    left_pd, right_pd = _random_frames(seed=11)
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got_rows = asof_join(
        left,
        right,
        on="ts",
        by="key",
        direction=direction,
        strict=False,
        tolerance_seconds=tolerance,
    ).collect()
    got = {int(r.lid): (None if r.right_rid is None else int(r.right_rid)) for r in got_rows}
    assert got == _expected(left_pd, right_pd, direction, tolerance)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_equal_timestamp_visibility(spark, direction, strict):
    """Equal cross-side timestamps, all four (direction, strict) combos,
    against pandas.merge_asof (strict == not allow_exact_matches)."""
    from go_nats_to_clickhouse_spark.operators.asof import asof_join

    left_pd = pd.DataFrame(
        {"lid": [1], "key": [0], "ts": [pd.Timestamp("2000-01-01 10:00:00")]}
    )
    right_pd = pd.DataFrame(
        {
            "rid": [5, 7, 9],
            "key": [0, 0, 0],
            "ts": pd.to_datetime(
                ["2000-01-01 09:00:00", "2000-01-01 10:00:00", "2000-01-01 11:00:00"]
            ),
        }
    )
    expected = pd.merge_asof(
        left_pd,
        right_pd.rename(columns={"ts": "r_ts"}),
        left_on="ts",
        right_on="r_ts",
        by="key",
        direction=direction,
        allow_exact_matches=not strict,
    )
    exp_rid = None if pd.isna(expected.rid[0]) else int(expected.rid[0])
    got = asof_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        by="key",
        direction=direction,
        strict=strict,
    ).collect()[0]
    got_rid = None if got.right_rid is None else int(got.right_rid)
    assert got_rid == exp_rid, f"{direction} strict={strict}"


def test_strict_excludes_equal_timestamps(spark):
    from go_nats_to_clickhouse_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 0, datetime(2000, 1, 1, 10))], "lid long, key long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, 0, datetime(2000, 1, 1, 10)),
            (5, 0, datetime(2000, 1, 1, 9)),
        ],
        "rid long, key long, ts timestamp",
    )
    inclusive = asof_join(left, right, by="key", direction="backward").collect()[0]
    strict = asof_join(left, right, by="key", direction="backward", strict=True).collect()[0]
    assert inclusive.right_rid == 7  # equal timestamp visible
    assert strict.right_rid == 5  # equal timestamp skipped


def test_nearest_equal_gap_tie_breaks_backward(spark):
    """direction='nearest' with an exactly equidistant candidate on each
    side must pick the BACKWARD one — both here and in pandas.merge_asof
    (direct equivalence for the mode that previously had only the indirect
    join_asof_nearest oracle; ADVICE r4)."""
    from go_nats_to_clickhouse_spark.operators.asof import asof_join

    left_pd = pd.DataFrame(
        {"lid": [1], "key": [0], "ts": [pd.Timestamp("2000-01-01 10:00:00")]}
    )
    right_pd = pd.DataFrame(
        {
            "rid": [5, 9],
            "key": [0, 0],
            "ts": pd.to_datetime(
                ["2000-01-01 09:30:00", "2000-01-01 10:30:00"]  # both 30 min away
            ),
        }
    )
    expected = pd.merge_asof(
        left_pd,
        right_pd.rename(columns={"ts": "r_ts"}),
        left_on="ts",
        right_on="r_ts",
        by="key",
        direction="nearest",
    )
    got = asof_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        by="key",
        direction="nearest",
    ).collect()[0]
    assert int(expected.rid[0]) == 5  # pandas breaks the tie backward
    assert got.right_rid == 5


def test_nearest_tolerance_drops_far_matches(spark):
    from go_nats_to_clickhouse_spark.operators.asof import asof_join

    left_pd = pd.DataFrame(
        {"lid": [1, 2], "key": [0, 0],
         "ts": pd.to_datetime(["2000-01-01 10:00:00", "2000-01-05 00:00:00"])}
    )
    right_pd = pd.DataFrame(
        {"rid": [5], "key": [0], "ts": pd.to_datetime(["2000-01-01 10:10:00"])}
    )
    got = {
        int(r.lid): (None if r.right_rid is None else int(r.right_rid))
        for r in asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            by="key",
            direction="nearest",
            tolerance_seconds=3600,
        ).collect()
    }
    assert got == {1: 5, 2: None}
