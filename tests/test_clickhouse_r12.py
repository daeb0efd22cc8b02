"""Round-12 ClickHouse analogs (queries/clickhouse_r12.py): each row is
checked two independent ways — (a) live DuckDB oracle agreement (the
same canonical compare the driver uses, run here because registry
activation is deferred to round 13; see the module docstring), and
(b) a from-scratch Python brute force proving the SEMANTICS, not just
engine agreement."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pyarrow.parquet as pq
import pytest

from go_nats_to_clickhouse_spark.queries import clickhouse_r12 as r12


def _oracle_df(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("events", "lineitem"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    try:
        return con.sql(sql).df()
    finally:
        con.close()


@pytest.mark.parametrize("name", sorted(r12.R12_ROWS))
def test_duckdb_oracle_agreement(spark, sf_dir, name):
    from tools.selfcheck import _canon, _hash_pdf

    fn, oracle = r12.R12_ROWS[name]
    spdf = _canon(fn(spark, sf_dir).toPandas())
    dpdf = _canon(_oracle_df(sf_dir, oracle))
    assert len(spdf) == len(dpdf)
    assert list(spdf.columns) == list(dpdf.columns)
    assert _hash_pdf(spdf) == _hash_pdf(dpdf)


def _events(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )
    return list(
        zip(
            t.column("event_type").to_pylist(),
            t.column("user_id").to_pylist(),
            [round(100 * v) for v in t.column("value").to_pylist()],
        )
    )


def test_proportions_ztest_matches_textbook(spark, sf_dir):
    rows = _events(sf_dir)
    n1 = sum(1 for et, _, _ in rows if et == "view")
    n2 = sum(1 for et, _, _ in rows if et == "click")
    x1 = sum(1 for et, _, v in rows if et == "view" and v > 5000)
    x2 = sum(1 for et, _, v in rows if et == "click" and v > 5000)
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    se = math.sqrt(p1 * (1 - p1) / n1 + p2 * (1 - p2) / n2)

    row = r12.agg_proportions_ztest(spark, sf_dir).collect()[0]
    assert (row.n1, row.n2, row.x1, row.x2) == (n1, n2, x1, x2)
    assert row.z_stat == pytest.approx(z, abs=2e-6)
    assert row.ci_low == pytest.approx(
        (p1 - p2) - r12.Z_ALPHA_95 * se, abs=2e-6
    )
    assert row.ci_high == pytest.approx(
        (p1 - p2) + r12.Z_ALPHA_95 * se, abs=2e-6
    )


def _ph64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_theta_sketch_matches_brute_force(spark, sf_dir):
    """Recompute the KMV estimator from first principles (python set +
    sort) and pin BOTH the estimates and their approximation quality:
    each estimate must be within 40% of the exact distinct count at
    k=64 (KMV relative error ~ 1/sqrt(k-2) ~ 13%; 40% is a loose but
    regression-catching band for the intersection, whose error scales
    with the inverse overlap fraction)."""
    rows = _events(sf_dir)
    K, D = r12.THETA_K, r12.THETA_DOMAIN
    ha = {_ph64(str(u)) for et, u, _ in rows if et == "view"}
    hb = {_ph64(str(u)) for et, u, _ in rows if et == "click"}

    def kmv(hs):
        if len(hs) < K:
            return len(hs), D
        theta = sorted(hs)[K - 1]
        return len(hs), theta

    def est(hs):
        nc, theta = kmv(hs)
        retained = K - 1 if len(hs) >= K else nc
        return retained * (D / theta)

    th_a = kmv(ha)[1]
    th_b = kmv(hb)[1]
    th_s = min(th_a, th_b)
    e_and = len([h for h in ha & hb if h < th_s]) * (D / th_s)
    e_not = len([h for h in ha - hb if h < th_s]) * (D / th_s)

    row = r12.agg_theta_sketch_setops(spark, sf_dir).collect()[0]
    assert row.k == K
    assert row.est_view == pytest.approx(est(ha), abs=1e-3)
    assert row.est_click == pytest.approx(est(hb), abs=1e-3)
    assert row.est_union == pytest.approx(est(ha | hb), abs=1e-3)
    assert row.est_intersect == pytest.approx(e_and, abs=1e-3)
    assert row.est_view_not_click == pytest.approx(e_not, abs=1e-3)

    # the sketch is an ESTIMATOR of real cardinalities — keep it honest
    for got, exact in (
        (row.est_view, len(ha)),
        (row.est_click, len(hb)),
        (row.est_union, len(ha | hb)),
        (row.est_intersect, len(ha & hb)),
        (row.est_view_not_click, len(ha - hb)),
    ):
        if exact >= K:  # saturated regime only — else it is exact
            assert abs(got - exact) / exact < 0.40, (got, exact)
        else:
            assert got == pytest.approx(exact, abs=1e-3)


def test_corr_matrix_matches_textbook(spark, sf_dir):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    )
    flags = t.column("l_returnflag").to_pylist()
    cols = {
        "qty": [round(100 * v) for v in t.column("l_quantity").to_pylist()],
        "price": [
            round(100 * v) for v in t.column("l_extendedprice").to_pylist()
        ],
        "disc": [round(100 * v) for v in t.column("l_discount").to_pylist()],
        "tax": [round(100 * v) for v in t.column("l_tax").to_pylist()],
    }

    def corr(flag, x, y):
        xs = [v for f, v in zip(flags, cols[x]) if f == flag]
        ys = [v for f, v in zip(flags, cols[y]) if f == flag]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        sxy = sum(a * b for a, b in zip(xs, ys)) / n - mx * my
        vx = sum(a * a for a in xs) / n - mx * mx
        vy = sum(b * b for b in ys) / n - my * my
        return sxy / math.sqrt(vx * vy)

    got = {r.flag: r for r in r12.agg_corr_matrix(spark, sf_dir).collect()}
    assert set(got) == set(flags)
    for flag in got:
        assert got[flag].n == flags.count(flag)
        for x, y in (("qty", "price"), ("qty", "disc"), ("price", "tax")):
            assert getattr(got[flag], f"corr_{x}_{y}") == pytest.approx(
                corr(flag, x, y), abs=2e-6
            ), (flag, x, y)


def test_ab_sample_size_matches_textbook(spark, sf_dir):
    rows = _events(sf_dir)
    n1 = sum(1 for et, _, _ in rows if et == "view")
    x1 = sum(1 for et, _, v in rows if et == "view" and v > 5000)
    clicks = [v / 100.0 for et, _, v in rows if et == "click"]
    p1 = x1 / n1
    mu = sum(clicks) / len(clicks)
    var = sum(v * v for v in clicks) / len(clicks) - mu * mu
    za, zb = r12.Z_ALPHA_95, r12.Z_POWER_80

    got = {r.mde: r for r in r12.scalar_ab_sample_size(spark, sf_dir).collect()}
    assert set(got) == set(r12.MDE_GRID)
    for mde in r12.MDE_GRID:
        p2 = p1 + mde
        pbar = (p1 + p2) / 2
        n_conv = (
            za * math.sqrt(2 * pbar * (1 - pbar))
            + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
        ) ** 2 / mde**2
        n_cont = 2 * (za + zb) ** 2 * var / (mde * mu) ** 2
        assert got[mde].baseline_rate == pytest.approx(p1, abs=2e-6)
        assert got[mde].baseline_mean == pytest.approx(mu, abs=2e-6)
        assert got[mde].n_conversion == pytest.approx(n_conv, abs=0.011)
        assert got[mde].n_continuous == pytest.approx(n_cont, abs=0.011)
        # planner sanity: smaller effects need more samples
    mdes = sorted(r12.MDE_GRID)
    for a, b in zip(mdes, mdes[1:]):
        assert got[a].n_conversion > got[b].n_conversion
        assert got[a].n_continuous > got[b].n_continuous


def test_registration_is_deferred_and_register_works(monkeypatch):
    from go_nats_to_clickhouse_spark import queries as qpkg
    from go_nats_to_clickhouse_spark.queries import registry

    for name in r12.R12_ROWS:
        assert name not in qpkg.QUERIES

    fresh_q: dict = {}
    fresh_o: dict = {}
    monkeypatch.setattr(registry, "QUERIES", fresh_q)
    monkeypatch.setattr(registry, "ORACLES", fresh_o)
    r12.register()
    assert set(fresh_q) == set(r12.R12_ROWS)
    assert set(fresh_o) == set(r12.R12_ROWS)
