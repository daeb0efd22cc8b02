"""Rounding-boundary regression pin for ``timeseries_resample_interpolate``
(the round-8 fuzz sweep's known-open finding, fixed round 9).

The failure class: a linear interpolation of hourly means lands EXACTLY
on a 6-dp rounding boundary, where Spark's ``round(double, 6)`` (exact
BigDecimal half-up) and DuckDB's (scale-multiply then ``std::round``)
legitimately disagree. The fix computes every rounding step as half-up
int64 micro-unit arithmetic. This test constructs the smallest fixture
that forces a .5-micro interpolation midpoint — hour 0 mean 333 micros
(milli-sum 1 over three rows: true mean 333.33), hour 2 mean 0, hour 1
missing, midpoint 166.5 micros — and pins Spark == DuckDB ==
hand-computed half-up integers on it.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from go_nats_to_clickhouse_spark.queries import ORACLES, QUERIES

H0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(tmp_path) -> str:
    rows = [
        # hour 0: milli-sum 1 over 3 rows -> true mean 333.33 micros,
        # half-up integer micros 333 (odd, so the hour-1 midpoint vs the
        # 0-micro hour 2 lands exactly on 166.5)
        (1, H0, 10, "view", 0.001, "{}"),
        (2, H0 + dt.timedelta(minutes=10), 10, "view", 0.0, "{}"),
        (3, H0 + dt.timedelta(minutes=20), 10, "view", 0.0, "{}"),
        # hour 1 missing entirely -> interpolated
        # hour 2: one row of 0.0 -> 0 micros
        (4, H0 + dt.timedelta(hours=2), 11, "view", 0.0, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    # load_table probes the footer of a single FILE named events.parquet
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_midpoint_half_micro_rounds_half_up_both_engines(spark, tmp_path):
    sf_dir = _write_events(tmp_path)
    got = {
        (r["event_type"], r["h"].hour): (r["observed"], r["v_interp"])
        for r in QUERIES["timeseries_resample_interpolate"](spark, sf_dir)
        .collect()
    }
    # hand-computed half-up integer micros: 333, midpoint 166.5 -> 167, 0
    assert got[("view", 0)] == (True, 0.000333)
    assert got[("view", 1)] == (False, 0.000167)
    assert got[("view", 2)] == (True, 0.0)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{sf_dir}/events.parquet'"
    )
    oracle = {
        (r[0], r[1].hour): (r[2], r[3])
        for r in con.sql(ORACLES["timeseries_resample_interpolate"]).fetchall()
    }
    assert oracle == got
