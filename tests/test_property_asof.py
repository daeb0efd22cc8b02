"""Property test: the merged-stream as-of operator vs DuckDB's native
ASOF JOIN on randomized keyed streams (with deliberate equal-timestamp
collisions, the subtle case: inclusive backward must see a right row at
exactly the left timestamp, strict must not)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from go_nats_to_clickhouse_spark.operators.asof import asof_join


def _frames(seed: int, n_left: int = 150, n_right: int = 120):
    rng = random.Random(seed)
    # coarse second grid -> frequent exact ts collisions across sides
    lt = [rng.randrange(0, 3000) * 10 for _ in range(n_left)]
    rt = [rng.randrange(0, 3000) * 10 for _ in range(n_right)]
    ldf = pd.DataFrame(
        {
            "ts": pd.to_datetime(lt, unit="s"),
            "k": [rng.randrange(0, 4) for _ in lt],
            "lid": range(len(lt)),
        }
    )
    rdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(rt, unit="s"),
            "k": [rng.randrange(0, 4) for _ in rt],
            "rv": [i for i in range(len(rt))],
        }
    )
    return ldf, rdf


@pytest.mark.parametrize("seed", [2, 9, 31])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_backward_matches_duckdb(spark, seed, strict):
    ldf, rdf = _frames(seed)
    sl = spark.createDataFrame(ldf)
    sr = spark.createDataFrame(rdf)
    got = {
        r.lid: r.right_ts
        for r in asof_join(
            sl, sr, on="ts", by="k", direction="backward", strict=strict
        ).collect()
    }

    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    op = "<" if strict else "<="
    want = {
        row[0]: row[1]
        for row in con.sql(
            f"""
            SELECT l.lid, r.ts
            FROM l ASOF LEFT JOIN r
              ON l.k = r.k AND r.ts {op} l.ts
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for lid, rts in want.items():
        g = got[lid]
        if rts is None:
            assert g is None, lid
        else:
            assert g is not None and g == rts, lid


@pytest.mark.parametrize("seed", [5, 17])
def test_asof_forward_matches_duckdb(spark, seed):
    ldf, rdf = _frames(seed)
    sl = spark.createDataFrame(ldf)
    sr = spark.createDataFrame(rdf)
    got = {
        r.lid: r.right_ts
        for r in asof_join(
            sl, sr, on="ts", by="k", direction="forward", strict=False
        ).collect()
    }
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    want = {
        row[0]: row[1]
        for row in con.sql(
            """
            SELECT l.lid, r.ts
            FROM l ASOF LEFT JOIN r
              ON l.k = r.k AND r.ts >= l.ts
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for lid, rts in want.items():
        g = got[lid]
        if rts is None:
            assert g is None, lid
        else:
            assert g is not None and g == rts, lid
