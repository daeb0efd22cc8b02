"""Property test locking the repo-wide signed-zero convention.

The round-3 driver red row (agg_bounding_ratio) came from DuckDB's round()
preserving the sign of a tiny negative (-1e-9 -> -0.0) while Spark's
returns +0.0; at 6-decimal stringification ("-0.000000" vs "0.000000")
that is a hash mismatch. The sanctioned normalization is ``+ 0.0`` after
the round on BOTH engine sides (IEEE 754: -0.0 + 0.0 = +0.0).

This test pushes randomized near-zero slopes/ratios through both engines
and asserts (a) without normalization the divergence class actually exists
for some input (the test would otherwise be vacuous), and (b) with the
``+ 0.0`` normalization the driver-style 6-decimal stringification agrees
on EVERY generated case.
"""

from __future__ import annotations

import math
import random

import duckdb
from pyspark.sql import functions as F


def _cases(seed: int = 20260814, n: int = 200) -> list[tuple[int, float, float]]:
    """(id, dy, dt_sec): slope = dy/dt spanning negative/positive tiny and
    ordinary magnitudes, including exact zeros and values that round to
    zero from below at 6 decimals."""
    rng = random.Random(seed)
    cases = []
    for i in range(n):
        kind = i % 5
        if kind == 0:  # tiny negative slope -> rounds to -0.0 in DuckDB
            dy = -rng.uniform(1e-10, 4e-7)
        elif kind == 1:  # tiny positive
            dy = rng.uniform(1e-10, 4e-7)
        elif kind == 2:  # exact zero numerator
            dy = 0.0
        elif kind == 3:  # ordinary negative
            dy = -rng.uniform(0.001, 100.0)
        else:  # ordinary positive
            dy = rng.uniform(0.001, 100.0)
        cases.append((i, dy, rng.uniform(0.5, 86400.0)))
    return cases


def _fmt(v: float) -> str:
    """Driver-style stringification (tools/selfcheck._norm_cell float path,
    signed zero NOT collapsed)."""
    if math.isnan(v):
        return "␀"
    return f"{v:.6f}" if abs(v) < 1e15 else repr(v)


def test_signed_zero_family_agrees_under_normalization(spark):
    cases = _cases()
    sdf = spark.createDataFrame(cases, "id long, dy double, dt double")
    raw = F.round(F.col("dy") / F.col("dt"), 6)
    got = {
        r.id: (r.raw, r.norm)
        for r in sdf.select(
            "id",
            raw.alias("raw"),
            (raw + F.lit(0.0)).alias("norm"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, CAST({dy!r} AS DOUBLE), CAST({dt!r} AS DOUBLE))"
                    for i, dy, dt in cases)
        + ") t(id, dy, dt)"
    )
    want = {
        i: (r, n)
        for i, r, n in con.sql(
            "SELECT id, round(dy / dt, 6) AS raw, round(dy / dt, 6) + 0.0 AS norm"
            " FROM c"
        ).fetchall()
    }

    divergent_raw = [
        i for i in want if _fmt(got[i][0]) != _fmt(want[i][0])
    ]
    # (a) the class is real: at least one generated case must diverge
    # without normalization, else this test proves nothing
    assert divergent_raw, (
        "expected at least one raw signed-zero divergence among generated "
        "cases — generator no longer covers the class"
    )
    for i in divergent_raw:
        # every raw divergence must be exactly the signed-zero class, not a
        # value disagreement
        assert abs(got[i][0]) == 0.0 and abs(want[i][0]) == 0.0, (
            f"case {i}: non-zero divergence {got[i][0]!r} vs {want[i][0]!r}"
        )
    # (b) normalization closes every case
    mism = [i for i in want if _fmt(got[i][1]) != _fmt(want[i][1])]
    assert not mism, f"normalized values still diverge for cases {mism[:5]}"
