"""Property tests for the round-10 statistical analogs under the inputs
the real fixtures never produce: per-series sizes of 1..8 (every
(n-1) mod 4 interpolation remainder, including the no-upper-neighbor
r = 0 boundary), massive ties from a tiny value domain, and skewed group
sizes. Each case runs the Spark query AND its DuckDB oracle on the same
synthetic parquet (driver-style 6-decimal agreement) plus an exact
integer brute force for the Tukey fences.

Contract note: agg_anova_f / agg_mean_ztest pivot the fixture's CLOSED
five-type event domain into columns (that is what pins the float
combination order — see queries/clickhouse_r10.py), so every generated
fixture populates all five types.
"""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_nats_to_clickhouse_spark.queries import clickhouse_r10 as r10


def _write_events(d, counts: dict[str, int], seed: int, domain: int = 9):
    rng = random.Random(seed)
    ids, ts, uid, et, val, props = [], [], [], [], [], []
    base = 1_700_000_000_000_000
    i = 0
    for t, n in counts.items():
        for _ in range(n):
            ids.append(i)
            ts.append(base + i * 1_000_000)
            uid.append(i % 7)
            et.append(t)
            val.append(round(rng.randrange(1, domain + 1) * 0.25, 2))
            props.append("{}")
            i += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et, pa.string()),
                "value": pa.array(val, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return {"et": et, "val": val}


def _fmt(v) -> str:
    return f"{v:.6f}" if isinstance(v, float) else str(v)


def _oracle_rows(d, sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    try:
        return con.sql(sql).fetchall()
    finally:
        con.close()


# per-type sizes hitting every (n-1) % 4 remainder incl. n=1 and n=2,
# plus a skewed case and two uniformly random cases
_CASES = [
    ({"click": 1, "error": 2, "purchase": 3, "signup": 4, "view": 5}, 11),
    ({"click": 8, "error": 5, "purchase": 1, "signup": 40, "view": 2}, 23),
    ({"click": 13, "error": 13, "purchase": 13, "signup": 13, "view": 13}, 37),
    ({"click": 30, "error": 7, "purchase": 19, "signup": 3, "view": 64}, 51),
]


@pytest.mark.parametrize("seed", [5, 17])
def test_decompose_cross_engine_on_gappy_series(
    spark, tmp_path, seed, decompose_model
):
    """Sparse hourly series with real gaps: the densification (missing
    hours are true zeros) is the risky path — an undensified ROWS frame
    would silently span gaps. Events land at random hours over a ~6-day
    span with ~60% of hours empty; Spark, DuckDB, and an exact integer
    model must agree bit-for-bit."""
    rng = random.Random(seed)
    d = tmp_path / f"gap{seed}"
    d.mkdir()
    ids, ts, uid, et, val, props = [], [], [], [], [], []
    base_us = 1_700_000_000_000_000  # deliberately NOT hour-aligned
    counts: dict[int, int] = {}
    i = 0
    for h in range(150):
        if rng.random() < 0.6:
            continue  # empty hour (gap)
        for _ in range(rng.randrange(1, 6)):
            t_us = base_us + h * 3_600_000_000 + rng.randrange(3_600) * 1_000_000
            ids.append(i)
            ts.append(t_us)
            uid.append(i % 7)
            et.append(rng.choice(["view", "click"]))
            val.append(1.0)
            props.append("{}")
            # bucket by the event's ACTUAL hour (the unaligned base means
            # in-hour offsets can cross the bucket boundary)
            hb = t_us // 3_600_000_000
            counts[hb] = counts.get(hb, 0) + 1
            i += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et, pa.string()),
                "value": pa.array(val, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )

    fn, oracle = r10.R10_ROWS["timeseries_decompose_seasonal"]
    sparkrows = fn(spark, str(d)).collect()
    srows = [[_fmt(v) for v in row] for row in sparkrows]
    orows = [[_fmt(v) for v in row] for row in _oracle_rows(d, oracle)]
    assert srows == orows

    # exact integer model over the densified grid (shared with
    # test_clickhouse_r10 via the conftest fixture)
    lo, xs, trend2, s48, cs = decompose_model(counts)
    assert len(sparkrows) == max(0, len(xs) - 24)
    got = {row.h_idx: row for row in sparkrows}
    for i, t2 in trend2.items():
        row = got[lo + i]
        hod = (lo + i) % 24
        assert row.n_events == xs[i]
        assert row.trend == t2 / 48.0
        assert row.seasonal == s48[hod] / (48.0 * cs[hod])


@pytest.mark.parametrize("counts,seed", _CASES)
def test_r10_rows_cross_engine_on_adversarial_fixtures(
    spark, tmp_path, counts, seed
):
    d = tmp_path / f"r10_{seed}"
    d.mkdir()
    data = _write_events(d, counts, seed)

    for name, (fn, oracle) in sorted(r10.R10_ROWS.items()):
        srows = [
            [_fmt(v) for v in row] for row in fn(spark, str(d)).collect()
        ]
        orows = [[_fmt(v) for v in row] for row in _oracle_rows(d, oracle)]
        assert srows == orows, f"{name} diverged on counts={counts}"

    # exact integer brute force for the Tukey fences and outlier counts
    per: dict[str, list[int]] = {}
    for t, v in zip(data["et"], data["val"]):
        per.setdefault(t, []).append(round(100 * v))
    got = {
        r.event_type: r
        for r in r10.timeseries_outliers_tukey(spark, str(d)).collect()
    }
    for t, vs in per.items():
        vs = sorted(vs)
        n = len(vs)

        def q4(p_num: int) -> int:
            i, r = divmod(p_num * (n - 1), 4)
            return (4 - r) * vs[i] + (r * vs[i + 1] if r else 0)

        q1_4, q3_4 = q4(1), q4(3)
        lo8 = 2 * q1_4 - 3 * (q3_4 - q1_4)
        hi8 = 2 * q3_4 + 3 * (q3_4 - q1_4)
        row = got[t]
        assert row.n == n
        assert row.q1 == q1_4 / 400.0 and row.q3 == q3_4 / 400.0
        assert row.fence_lo == lo8 / 800.0 and row.fence_hi == hi8 / 800.0
        assert row.n_outliers == sum(
            1 for v in vs if 8 * v < lo8 or 8 * v > hi8
        )
