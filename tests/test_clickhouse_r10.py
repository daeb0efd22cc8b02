"""Round-10 statistical analogs (queries/clickhouse_r10.py): each row is
checked two independent ways — (a) live DuckDB oracle agreement (the
same canonical compare the driver uses, run here because registry
activation is deferred to round 11; see the module docstring), and
(b) a from-scratch Python brute force proving the SEMANTICS, not just
engine agreement."""

from __future__ import annotations

import math
from datetime import timezone

import duckdb
import pyarrow.parquet as pq
import pytest

from go_nats_to_clickhouse_spark.queries import clickhouse_r10 as r10


def _oracle_df(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    try:
        return con.sql(sql).df()
    finally:
        con.close()


@pytest.mark.parametrize("name", sorted(r10.R10_ROWS))
def test_duckdb_oracle_agreement(spark, sf_dir, name):
    from tools.selfcheck import _canon, _hash_pdf

    fn, oracle = r10.R10_ROWS[name]
    spdf = _canon(fn(spark, sf_dir).toPandas())
    dpdf = _canon(_oracle_df(sf_dir, oracle))
    assert len(spdf) == len(dpdf)
    assert list(spdf.columns) == list(dpdf.columns)
    assert _hash_pdf(spdf) == _hash_pdf(dpdf)


def _values(sf_dir: str) -> list[tuple[str, int]]:
    """(event_type, 100x-scaled int value) straight off the parquet."""
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return [
        (et, round(100 * v))
        for et, v in zip(
            t.column("event_type").to_pylist(), t.column("value").to_pylist()
        )
    ]


def test_anova_f_matches_textbook(spark, sf_dir):
    rows = _values(sf_dir)
    groups: dict[str, list[float]] = {}
    for et, v2 in rows:
        groups.setdefault(et, []).append(v2 / 100.0)
    n = sum(len(g) for g in groups.values())
    k = len(groups)
    grand = sum(sum(g) for g in groups.values()) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw = sum(
        sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))

    row = r10.agg_anova_f(spark, sf_dir).collect()[0]
    assert row.n_groups == k == 5
    assert row.n_rows == n
    assert row.df_between == k - 1
    assert row.df_within == n - k
    assert row.f_stat == pytest.approx(f, abs=2e-6)


def test_mean_ztest_matches_textbook(spark, sf_dir):
    rows = _values(sf_dir)
    a = [v2 / 100.0 for et, v2 in rows if et == "view"]
    b = [v2 / 100.0 for et, v2 in rows if et == "click"]
    m1, m2 = sum(a) / len(a), sum(b) / len(b)
    se = math.sqrt(r10.POP_VAR_VIEW / len(a) + r10.POP_VAR_CLICK / len(b))

    row = r10.agg_mean_ztest(spark, sf_dir).collect()[0]
    assert row.n_view == len(a) and row.n_click == len(b)
    assert row.mean_view == pytest.approx(m1, abs=2e-6)
    assert row.mean_click == pytest.approx(m2, abs=2e-6)
    assert row.z_stat == pytest.approx((m1 - m2) / se, abs=2e-6)
    assert row.ci_low == pytest.approx(
        (m1 - m2) - r10.Z_975 * se, abs=2e-6
    )
    assert row.ci_high == pytest.approx(
        (m1 - m2) + r10.Z_975 * se, abs=2e-6
    )


def test_tukey_fences_match_exact_interpolation(spark, sf_dir):
    """Integer-exact reference: 4*Q1 and 8*fence are exact ints, so the
    engine's fences and outlier counts must match BIT-exactly."""
    rows = _values(sf_dir)
    per: dict[str, list[int]] = {}
    for et, v2 in rows:
        per.setdefault(et, []).append(v2)

    got = {
        r.event_type: r
        for r in r10.timeseries_outliers_tukey(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for et, vs in per.items():
        vs = sorted(vs)
        n = len(vs)

        def q4(p_num: int) -> int:  # 4*quantile at p = p_num/4
            h4 = p_num * (n - 1)
            i, r = divmod(h4, 4)
            return (4 - r) * vs[i] + (r * vs[i + 1] if r else 0)

        q1_4, q3_4 = q4(1), q4(3)
        lo8 = 2 * q1_4 - 3 * (q3_4 - q1_4)
        hi8 = 2 * q3_4 + 3 * (q3_4 - q1_4)
        n_out = sum(1 for v in vs if 8 * v < lo8 or 8 * v > hi8)
        row = got[et]
        assert row.n == n
        assert row.q1 == q1_4 / 400.0
        assert row.q3 == q3_4 / 400.0
        assert row.fence_lo == lo8 / 800.0
        assert row.fence_hi == hi8 / 800.0
        assert row.n_outliers == n_out


def test_decompose_seasonal_matches_exact_model(spark, sf_dir, decompose_model):
    """Integer-exact reference for the classical decomposition: trend2,
    d48 and the per-hour-of-day seasonal sums are exact ints, so every
    output double must match bit-exactly."""
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    counts: dict[int, int] = {}
    for ts in t.column("ts").to_pylist():
        # pyarrow returns naive-UTC datetimes for timestamp(us)
        us = int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        h = us // 3_600_000_000
        counts[h] = counts.get(h, 0) + 1
    lo, xs, trend2, s48, cs = decompose_model(counts)

    rows = r10.timeseries_decompose_seasonal(spark, sf_dir).collect()
    assert len(rows) == len(trend2)
    for row in rows:
        i = row.h_idx - lo
        hod = row.h_idx % 24
        assert row.n_events == xs[i]
        assert row.trend == trend2[i] / 48.0
        seasonal = s48[hod] / (48.0 * cs[hod])
        assert row.seasonal == seasonal
        assert row.resid == (xs[i] - trend2[i] / 48.0) - seasonal


def test_registration_is_active_and_register_is_exact(monkeypatch):
    """Round-11 contract: queries/__init__ now calls ``register()``, so
    every R10_ROWS name is live in the global registry with its oracle;
    and ``register()`` itself installs exactly the R10_ROWS (name,
    oracle) pairs — all four of them — into whatever registry is
    current."""
    from go_nats_to_clickhouse_spark import queries as qpkg
    from go_nats_to_clickhouse_spark.queries import registry

    for name in r10.R10_ROWS:
        assert name in qpkg.QUERIES
        assert name in qpkg.ORACLES

    fresh_q: dict = {}
    fresh_o: dict = {}
    monkeypatch.setattr(registry, "QUERIES", fresh_q)
    monkeypatch.setattr(registry, "ORACLES", fresh_o)
    r10.register()
    assert set(fresh_q) == set(r10.R10_ROWS)
    assert set(fresh_o) == set(r10.R10_ROWS)
    assert fresh_o["agg_anova_f"] == r10.ORACLE_ANOVA
