"""Property tests for the round-11 statistical analogs on inputs the
real fixtures never produce: tiny per-series sizes, massive ties,
timestamps exactly ON half-life boundaries, and series spanning more
than 40 half-lives (the weight-zero cutoff). Each case runs the Spark
query AND its DuckDB oracle on the same synthetic parquet
(driver-style 6-decimal agreement), plus exact Python references.

Excluded on purpose: n == 1 and constant-valued series for
agg_skew_kurt (sample variance divides by n-1 and the standardized
moments divide by m2 — both engines produce inf/NaN there identically
per IEEE, but those rows are meaningless; the fixture generator keeps
n >= 3 and a spread value domain for the moments query). EMA has no
such restriction (the newest event always carries weight 2^40, so the
denominator is never zero) and IS tested down to n = 1.
"""

from __future__ import annotations

import math
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_nats_to_clickhouse_spark.queries import clickhouse_r11 as r11

HL_US = r11.EMA_HALFLIFE_S * 1_000_000


def _write_events(d, rows):
    """rows: list of (event_type, t_us, cents)."""
    ids, ts, uid, et, val, props = [], [], [], [], [], []
    for i, (t, t_us, cents) in enumerate(rows):
        ids.append(i)
        ts.append(t_us)
        uid.append(i % 7)
        et.append(t)
        val.append(cents / 100.0)
        props.append("{}")
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


def _fmt(v) -> str:
    return f"{v:.6f}" if isinstance(v, float) else str(v)


def _oracle_rows(d, sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    try:
        return con.sql(sql).fetchall()
    finally:
        con.close()


def _assert_cross_engine(spark, d, name):
    fn, oracle = {
        "agg_skew_kurt": (r11.agg_skew_kurt, r11.ORACLE_SKEW_KURT),
        "agg_exp_moving_avg": (r11.agg_exp_moving_avg, r11.ORACLE_EMA),
    }[name]
    srows = [[_fmt(v) for v in row] for row in fn(spark, str(d)).collect()]
    orows = [[_fmt(v) for v in row] for row in _oracle_rows(d, oracle)]
    assert srows == orows, f"{name} diverged"


BASE_US = 1_700_000_000_000_000


@pytest.mark.parametrize("seed", [3, 29, 101])
def test_skew_kurt_cross_engine_and_brute_force(spark, tmp_path, seed):
    """Tiny series (n=3..9), heavy ties from a 6-value domain, and the
    value-domain ceiling that overflows int64 at the 4th power
    (56021 cents appears verbatim)."""
    rng = random.Random(seed)
    d = tmp_path / f"sk{seed}"
    d.mkdir()
    domain = [1, 7, 7, 2500, 49002, 56021]
    rows = []
    per: dict[str, list[int]] = {}
    for t in ("click", "error", "purchase", "signup", "view"):
        n = rng.randrange(3, 10)
        # force a spread: at least two distinct values per series
        vals = [domain[0], domain[-1]] + [
            rng.choice(domain) for _ in range(n - 2)
        ]
        for j, c in enumerate(vals):
            rows.append((t, BASE_US + len(rows) * 1_000_000, c))
        per[t] = vals
    _write_events(d, rows)

    _assert_cross_engine(spark, d, "agg_skew_kurt")

    got = {
        r.event_type: r for r in r11.agg_skew_kurt(spark, str(d)).collect()
    }
    for t, cents in per.items():
        xs = [c / 100.0 for c in cents]
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        s2s = n * m2 / (n - 1)
        r = got[t]
        assert r.n == n
        assert r.skew_pop == pytest.approx(m3 / m2**1.5, abs=1e-6)
        assert r.skew_samp == pytest.approx(m3 / s2s**1.5, abs=1e-6)
        assert r.kurt_pop == pytest.approx(m4 / m2**2, abs=1e-6)
        assert r.kurt_samp == pytest.approx(m4 / s2s**2, abs=1e-6)


def test_ema_halflife_boundaries_cross_engine(spark, tmp_path):
    """Timestamps exactly ON half-life multiples (the floor boundary),
    one series spanning 45 half-lives (> the 40-step cutoff: old events
    weigh exactly zero), one singleton series, and sub-half-life jitter
    that must NOT change the step index."""
    d = tmp_path / "emabound"
    d.mkdir()
    rows = []
    # 'view': events at exactly 0, 1, 2, 3 half-lives before the newest
    for k in range(4):
        rows.append(("view", BASE_US + (3 - k) * HL_US, 100 * (k + 1)))
    # 'click': 45-half-life span; only the last 40 steps can weigh in
    for k in (0, 1, 39, 40, 45):
        rows.append(("click", BASE_US + (45 - k) * HL_US, 700 + k))
    # 'purchase': singleton
    rows.append(("purchase", BASE_US, 12345))
    # 'error': jitter of +1s / +halflife-1s around step boundaries
    rows.append(("error", BASE_US + 2 * HL_US, 1000))  # newest, k=0
    rows.append(("error", BASE_US + HL_US + 1_000_000, 2000))  # k=0 (dt<hl)
    rows.append(("error", BASE_US + 1_000_000, 3000))  # k=1 (hl<=dt<2hl)
    rows.append(("error", BASE_US, 4000))  # k=2 exactly
    _write_events(d, rows)

    _assert_cross_engine(spark, d, "agg_exp_moving_avg")

    got = {
        r.event_type: r
        for r in r11.agg_exp_moving_avg(spark, str(d)).collect()
    }
    # view: weights 2^0.. for k=0..3 over values 1,2,3,4 (newest = k=0
    # is the k-loop's first append with value 100*(0+1)/100 = 1.0)
    num = sum((k + 1) * math.ldexp(1.0, -k) for k in range(4))
    den = sum(math.ldexp(1.0, -k) for k in range(4))
    assert got["view"].ema_value == pytest.approx(num / den, abs=1e-6)
    # click: the k=40 and k=45 events weigh exactly zero
    vals = {0: 7.00, 1: 7.01, 39: 7.39, 40: 7.40, 45: 7.45}
    num = sum(v * math.ldexp(1.0, -k) for k, v in vals.items() if k < 40)
    den = sum(math.ldexp(1.0, -k) for k in vals if k < 40)
    assert got["click"].ema_value == pytest.approx(num / den, abs=1e-6)
    assert got["click"].n == 5  # count still includes zero-weight rows
    # purchase: singleton EMA is the value itself
    assert got["purchase"].ema_value == pytest.approx(123.45, abs=1e-6)
    # error: steps 0,0,1,2 per the jitter comments
    num = (
        10.0 + 20.0 + 30.0 * math.ldexp(1.0, -1) + 40.0 * math.ldexp(1.0, -2)
    )
    den = 1.0 + 1.0 + 0.5 + 0.25
    assert got["error"].ema_value == pytest.approx(num / den, abs=1e-6)


@pytest.mark.parametrize("seed", [11, 47])
def test_ema_random_timelines_cross_engine(spark, tmp_path, seed):
    """Random irregular timelines (including duplicate timestamps) per
    series: cross-engine agreement plus the staircase Python model."""
    rng = random.Random(seed)
    d = tmp_path / f"ema{seed}"
    d.mkdir()
    rows = []
    per: dict[str, list[tuple[int, int]]] = {}
    for t in ("view", "click", "purchase"):
        n = rng.randrange(1, 30)
        for _ in range(n):
            t_us = BASE_US + rng.randrange(0, 50 * HL_US)
            if rng.random() < 0.2 and per.get(t):
                t_us = per[t][-1][0]  # duplicate timestamp
            cents = rng.randrange(1, 56022)
            rows.append((t, t_us, cents))
            per.setdefault(t, []).append((t_us, cents))
    _write_events(d, rows)

    _assert_cross_engine(spark, d, "agg_exp_moving_avg")

    got = {
        r.event_type: r
        for r in r11.agg_exp_moving_avg(spark, str(d)).collect()
    }
    for t, evs in per.items():
        tmax = max(t_us for t_us, _ in evs)
        num = den = 0.0
        for t_us, cents in evs:
            k = (tmax - t_us) // HL_US
            if k < r11.EMA_MAX_HL:
                w = math.ldexp(1.0, -int(k))
                num += (cents / 100.0) * w
                den += w
        assert got[t].n == len(evs)
        assert got[t].ema_value == pytest.approx(num / den, abs=1e-6, rel=1e-6)
