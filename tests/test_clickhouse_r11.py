"""Round-11 statistical analogs (queries/clickhouse_r11.py): each row
checked two independent ways — (a) live DuckDB oracle agreement (the
driver's canonical compare), and (b) a from-scratch Python brute force
proving the SEMANTICS (moment formulas / staircase decay), not just
engine agreement."""

from __future__ import annotations

import math

import duckdb
import pyarrow.parquet as pq
import pytest

from go_nats_to_clickhouse_spark.queries import clickhouse_r11 as r11

R11_ROWS = {
    "agg_skew_kurt": (r11.agg_skew_kurt, r11.ORACLE_SKEW_KURT),
    "agg_exp_moving_avg": (r11.agg_exp_moving_avg, r11.ORACLE_EMA),
}


def _oracle_df(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    try:
        return con.sql(sql).df()
    finally:
        con.close()


@pytest.mark.parametrize("name", sorted(R11_ROWS))
def test_duckdb_oracle_agreement(spark, sf_dir, name):
    from tools.selfcheck import _canon, _hash_pdf

    fn, oracle = R11_ROWS[name]
    spdf = _canon(fn(spark, sf_dir).toPandas())
    dpdf = _canon(_oracle_df(sf_dir, oracle))
    assert len(spdf) == len(dpdf)
    assert list(spdf.columns) == list(dpdf.columns)
    assert _hash_pdf(spdf) == _hash_pdf(dpdf)


def test_rows_are_registered_and_windowed():
    """Both rows are live in the global registry AND inside the driver's
    50-slot sample window (the staleness gate's invariant for new
    rows)."""
    import __spark_entry__ as entry

    from go_nats_to_clickhouse_spark.queries import ORACLES, QUERIES

    for name in R11_ROWS:
        assert name in QUERIES and name in ORACLES
        assert name in entry._PRIORITY[:50]


def _events(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value", "ts"]
    )
    return list(
        zip(
            t.column("event_type").to_pylist(),
            [round(100 * v) for v in t.column("value").to_pylist()],
            t.column("ts").to_pylist(),
        )
    )


def test_skew_kurt_matches_textbook(spark, sf_dir):
    """Brute-force central moments on the UNscaled values; ClickHouse's
    definitions — skewPop = m3/m2^1.5, kurtPop = m4/m2^2 (raw, not
    excess), *Samp = population m3/m4 over the unbiased variance."""
    per: dict[str, list[float]] = {}
    for et, v2, _ in _events(sf_dir):
        per.setdefault(et, []).append(v2 / 100.0)

    got = {r.event_type: r for r in r11.agg_skew_kurt(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for et, xs in per.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        s2s = sum((x - mu) ** 2 for x in xs) / (n - 1)
        r = got[et]
        assert r.n == n
        assert r.skew_pop == pytest.approx(m3 / m2**1.5, rel=1e-4)
        assert r.skew_samp == pytest.approx(m3 / s2s**1.5, rel=1e-4)
        assert r.kurt_pop == pytest.approx(m4 / m2**2, rel=1e-4)
        assert r.kurt_samp == pytest.approx(m4 / s2s**2, rel=1e-4)
        # raw kurtosis of anything unimodal-ish is positive; sanity that
        # the pop/samp pair brackets sensibly (s2s > m2 => samp < pop)
        assert r.kurt_samp < r.kurt_pop
        assert abs(r.skew_samp) < abs(r.skew_pop)


def test_ema_matches_staircase_reference(spark, sf_dir):
    """Brute-force the documented analog semantics: weight
    2^-floor(dt/halflife) anchored at each series' newest event, zero
    past 40 half-lives."""
    per: dict[str, list[tuple[int, float]]] = {}
    for et, v2, ts in _events(sf_dir):
        per.setdefault(et, []).append((int(ts.timestamp()), v2 / 100.0))

    got = {
        r.event_type: r
        for r in r11.agg_exp_moving_avg(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for et, rows in per.items():
        tmax = max(t for t, _ in rows)
        num = den = 0.0
        for t, x in rows:
            k = (tmax - t) // r11.EMA_HALFLIFE_S
            if k < r11.EMA_MAX_HL:
                w = math.ldexp(1.0, -int(k))
                num += x * w
                den += w
        r = got[et]
        assert r.n == len(rows)
        assert r.ema_value == pytest.approx(num / den, rel=1e-6)


def test_ema_decay_shape(spark, sf_dir):
    """The EMA must sit between the newest event's value and the plain
    mean is NOT guaranteed, but it must be finite, positive, and the
    weights must actually decay: recomputing with halflife -> infinity
    (all weights equal) gives the plain mean, which should differ from
    the engine's time-decayed value for every series in this fixture."""
    per: dict[str, list[float]] = {}
    for et, v2, _ in _events(sf_dir):
        per.setdefault(et, []).append(v2 / 100.0)
    got = {
        r.event_type: r.ema_value
        for r in r11.agg_exp_moving_avg(spark, sf_dir).collect()
    }
    for et, xs in per.items():
        plain = sum(xs) / len(xs)
        assert got[et] > 0.0
        assert got[et] != pytest.approx(plain, abs=1e-9)


def test_t_sec_truncation_agrees_engine_by_engine(spark, sf_dir):
    """Round-12 regression pin for ADVICE r11 #1: the _V2_SQL oracle's
    t_sec must TRUNCATE sub-second timestamps exactly like Spark's
    unix_timestamp. DuckDB's epoch() returns DOUBLE and a bare CAST
    rounds to nearest — on this fixture (sub-second ts values) that
    diverged on ~10% of rows and the 6-decimal EMA matched only by
    dilution. floor(epoch(ts)) is the repo-wide convention; this test
    compares the two engines' (event_type, v2, t_sec) multisets so the
    CAST-rounding class cannot quietly return."""
    from collections import Counter

    import duckdb

    from go_nats_to_clickhouse_spark.queries.clickhouse_r11 import _scaled

    sp = Counter(
        (r.event_type, r.v2, r.t_sec)
        for r in _scaled(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    try:
        du = con.sql(
            """
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v2,
                   CAST(floor(epoch(ts)) AS BIGINT) AS t_sec,
                   CAST(epoch(ts) AS BIGINT) AS t_sec_cast
            FROM events
            """
        ).fetchall()
    finally:
        con.close()
    assert sp == Counter((et, v2, t) for et, v2, t, _ in du)
    # the fixture really exercises the boundary — a bare CAST would
    # have disagreed on a material fraction of rows
    assert sum(t != tc for _, _, t, tc in du) > 0
