"""Property tests for the round-12 analogs on inputs the real fixtures
never produce: sketch populations straddling the saturation boundary
(n < k, n == k, n >> k), disjoint / identical / partially-overlapping
user sets, tiny proportions populations, and correlation groups at the
int64-edge value domain. Each case runs the Spark query AND its DuckDB
oracle on the same synthetic parquet (driver-style 6-decimal
agreement), plus exact Python references (a from-first-principles KMV
for the sketch).

Degenerate cases excluded on purpose: both-populations-all-success (or
all-failure) for the proportions z (pooled p*(1-p) hits exactly zero →
0/0, identically NaN in both engines but meaningless), and
zero-variance columns for corrMatrix (0/0 the same way; TPC-H columns
never are). The sketch has no such exclusions — an entirely ABSENT
population (contract: zero result rows, the join algebra's natural
answer in both engines, pinned below), n == 1, and full overlap are
all exercised.
"""

from __future__ import annotations

import hashlib
import math
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_nats_to_clickhouse_spark.queries import clickhouse_r12 as r12


def _write_events(d, rows):
    """rows: list of (event_type, user_id, cents)."""
    ids, ts, uid, et, val, props = [], [], [], [], [], []
    for i, (t, u, cents) in enumerate(rows):
        ids.append(i)
        ts.append(1_700_000_000_000_000 + i * 1_000_000)
        uid.append(u)
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


def _write_lineitem(d, rows):
    """rows: list of (flag, qty_c, price_c, disc_c, tax_c) in cents."""
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
                "l_quantity": pa.array(
                    [r[1] / 100.0 for r in rows], pa.float64()
                ),
                "l_extendedprice": pa.array(
                    [r[2] / 100.0 for r in rows], pa.float64()
                ),
                "l_discount": pa.array(
                    [r[3] / 100.0 for r in rows], pa.float64()
                ),
                "l_tax": pa.array([r[4] / 100.0 for r in rows], pa.float64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )


def _fmt(v) -> str:
    return f"{v:.6f}" if isinstance(v, float) else str(v)


def _oracle_rows(d, sql, tables=("events",)):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    try:
        return con.sql(sql).fetchall()
    finally:
        con.close()


def _assert_cross_engine(spark, d, name, tables=("events",)):
    fn, oracle = r12.R12_ROWS[name]
    srows = [[_fmt(v) for v in row] for row in fn(spark, str(d)).collect()]
    orows = [[_fmt(v) for v in row] for row in _oracle_rows(d, oracle, tables)]
    assert srows == orows, f"{name} diverged"


def _ph64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _kmv_reference(view_users, click_users):
    """From-first-principles KMV/theta reference (pure python)."""
    K, D = r12.THETA_K, r12.THETA_DOMAIN
    ha = {_ph64(str(u)) for u in view_users}
    hb = {_ph64(str(u)) for u in click_users}

    def theta(hs):
        return sorted(hs)[K - 1] if len(hs) >= K else D

    def est(hs):
        retained = K - 1 if len(hs) >= K else len(hs)
        return retained * (D / theta(hs))

    th_s = min(theta(ha), theta(hb))
    return {
        "est_view": est(ha),
        "est_click": est(hb),
        "est_union": est(ha | hb),
        "est_intersect": len([h for h in ha & hb if h < th_s]) * (D / th_s),
        "est_view_not_click": len([h for h in ha - hb if h < th_s])
        * (D / th_s),
    }


@pytest.mark.parametrize(
    "case,n_view,n_click,overlap",
    [
        ("unsat_both", 10, 5, 3),  # both under k: everything exact
        ("exactly_k", r12.THETA_K, r12.THETA_K, 20),  # the boundary
        ("sat_vs_unsat", 500, 9, 9),  # click ⊂ view, only view saturated
        ("disjoint", 300, 300, 0),  # empty intersection estimate
        ("identical", 400, 400, 400),  # A == B == union
        ("single", 1, 1, 1),  # n = 1 (and n=1 ∩ n=1)
    ],
)
def test_theta_sketch_regimes(spark, tmp_path, case, n_view, n_click, overlap):
    d = tmp_path / case
    d.mkdir()
    view_users = list(range(1000, 1000 + n_view))
    click_users = view_users[:overlap] + list(
        range(500_000, 500_000 + n_click - overlap)
    )
    rows = [("view", u, 100) for u in view_users]
    rows += [("click", u, 200) for u in click_users]
    if view_users:
        # duplicate events per user must not matter (sketches see DISTINCT)
        rows += [("view", view_users[0], 999)] * 3
    # a third event type must be ignored entirely
    rows += [("purchase", 42, 100)] * 5
    _write_events(d, rows)

    _assert_cross_engine(spark, d, "agg_theta_sketch_setops")

    ref = _kmv_reference(view_users, click_users)
    row = r12.agg_theta_sketch_setops(spark, str(d)).collect()[0]
    for col, expect in ref.items():
        assert getattr(row, col) == pytest.approx(expect, abs=1e-3), (
            case,
            col,
        )
    # unsaturated sketches must be EXACT, not estimates
    if n_view < r12.THETA_K and n_click < r12.THETA_K:
        assert row.est_view == n_view
        assert row.est_click == n_click
        assert row.est_intersect == overlap


def test_theta_sketch_absent_population_contract(spark, tmp_path):
    """An entirely ABSENT population yields ZERO result rows — the
    natural answer of the cross-join algebra (the per-pop sketch frame
    is empty, and every estimate is a join against it), identical in
    both engines. Pinned so a regression cannot make one side emit a
    NULL/NaN row while the other stays empty; callers wanting
    ClickHouse's uniqTheta-of-empty == 0 semantics filter upstream."""
    d = tmp_path / "absent"
    d.mkdir()
    _write_events(
        d,
        [("view", u, 100) for u in range(200)]
        + [("purchase", 42, 100)] * 5,  # still no 'click' rows
    )
    srows = r12.agg_theta_sketch_setops(spark, str(d)).collect()
    fn, oracle = r12.R12_ROWS["agg_theta_sketch_setops"]
    orows = _oracle_rows(d, oracle)
    assert srows == [] and orows == []


@pytest.mark.parametrize("seed", [5, 31])
def test_proportions_ztest_tiny_and_skewed(spark, tmp_path, seed):
    """Tiny populations (down to n=2) and success rates near the
    0 / 1 edges (but never exactly — see module docstring)."""
    rng = random.Random(seed)
    d = tmp_path / f"pz{seed}"
    d.mkdir()
    n1, n2 = rng.randrange(2, 8), rng.randrange(40, 60)
    x1 = rng.randrange(1, n1)  # at least one success and one failure
    x2 = rng.randrange(1, n2)
    rows = [("view", i, 9000 if i < x1 else 100) for i in range(n1)]
    rows += [("click", i, 9000 if i < x2 else 100) for i in range(n2)]
    _write_events(d, rows)

    _assert_cross_engine(spark, d, "agg_proportions_ztest")

    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    row = r12.agg_proportions_ztest(spark, str(d)).collect()[0]
    assert (row.n1, row.x1, row.n2, row.x2) == (n1, x1, n2, x2)
    assert row.z_stat == pytest.approx(z, abs=1e-6)


@pytest.mark.parametrize("seed", [7, 43])
def test_corr_matrix_edge_domain(spark, tmp_path, seed):
    """Tiny groups (n=2..6), massive ties, perfectly correlated and
    anti-correlated pairs, and the value ceiling where price^2 needs
    the decimal accumulator (11,000,00 cents squared ~ 1.2e14/el)."""
    rng = random.Random(seed)
    d = tmp_path / f"cm{seed}"
    d.mkdir()
    rows = []
    per = {}
    for flag in ("A", "N", "R"):
        n = rng.randrange(2, 7)
        qs = [rng.randrange(100, 5001) for _ in range(n)]
        if len(set(qs)) == 1:
            qs[0] += 100  # keep variance nonzero
        # price perfectly correlated with qty; disc anti-correlated;
        # tax independent-ish with ties
        ps = [q * 2200 for q in qs]  # ceiling ~1.1e7 cents
        ds = [1000 - q // 10 for q in qs]
        ts = [rng.choice((0, 400, 400, 800)) for _ in range(n)]
        if len(set(ts)) == 1:
            ts[0] += 100
        per[flag] = (qs, ps, ds, ts)
        rows += list(zip([flag] * n, qs, ps, ds, ts))
    _write_lineitem(d, rows)

    _assert_cross_engine(spark, d, "agg_corr_matrix", tables=("lineitem",))

    got = {r.flag: r for r in r12.agg_corr_matrix(spark, str(d)).collect()}
    for flag, (qs, ps, ds, ts) in per.items():

        def corr(xs, ys):
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            sxy = sum(a * b for a, b in zip(xs, ys)) / n - mx * my
            vx = sum(a * a for a in xs) / n - mx * mx
            vy = sum(b * b for b in ys) / n - my * my
            return sxy / math.sqrt(vx * vy)

        assert got[flag].corr_qty_price == pytest.approx(1.0, abs=1e-6)
        assert got[flag].corr_qty_disc == pytest.approx(
            corr(qs, ds), abs=1e-6
        )
        assert got[flag].corr_price_tax == pytest.approx(
            corr(ps, ts), abs=1e-6
        )


def test_ab_sample_size_formula_on_synthetic_baseline(spark, tmp_path):
    """A hand-built baseline (p1 = 0.25 exactly, click mean/var from a
    3-value domain) — the planner must reproduce the closed forms to
    the cent, and p1 + max(mde) stays < 1 by the query's construction
    (mde grid caps at 0.05)."""
    d = tmp_path / "ab"
    d.mkdir()
    rows = [("view", i, 9000 if i < 25 else 100) for i in range(100)]
    clicks = [1000, 3000, 8000] * 10
    rows += [("click", i, c) for i, c in enumerate(clicks)]
    _write_events(d, rows)

    _assert_cross_engine(spark, d, "scalar_ab_sample_size")

    mu = sum(c / 100.0 for c in clicks) / len(clicks)
    var = sum((c / 100.0) ** 2 for c in clicks) / len(clicks) - mu * mu
    za, zb = r12.Z_ALPHA_95, r12.Z_POWER_80
    got = {
        r.mde: r for r in r12.scalar_ab_sample_size(spark, str(d)).collect()
    }
    for mde in r12.MDE_GRID:
        p1, p2 = 0.25, 0.25 + mde
        pbar = (p1 + p2) / 2
        n_conv = (
            za * math.sqrt(2 * pbar * (1 - pbar))
            + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
        ) ** 2 / mde**2
        n_cont = 2 * (za + zb) ** 2 * var / (mde * mu) ** 2
        assert got[mde].baseline_rate == pytest.approx(0.25, abs=1e-9)
        assert got[mde].n_conversion == pytest.approx(n_conv, abs=0.011)
        assert got[mde].n_continuous == pytest.approx(n_cont, abs=0.011)
