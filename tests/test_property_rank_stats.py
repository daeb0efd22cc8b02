"""Property test for the two-sample rank statistics under HEAVY ties.

agg_mann_whitney / agg_ks_test build their statistics from doubled
average ranks and integer-crossed ECDFs so both engines see exact int64
sums. Ties are the risky path (the average-rank and tie-correction terms
only matter when values collide), and the fixtures only have incidental
ties — so this test generates two-sample data from a deliberately tiny
value domain (massive tie groups), runs BOTH the Spark query and the
DuckDB oracle on the same parquet, and asserts driver-style 6-decimal
agreement plus textbook-brute-force agreement.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_nats_to_clickhouse_spark.queries.registry import ORACLES, QUERIES


def _write_events(tmp_path, seed: int, n: int = 600, domain: int = 12):
    """events.parquet with only ~``domain`` distinct values -> huge ties."""
    rng = random.Random(seed)
    rows = {
        "event_id": [],
        "ts": [],
        "user_id": [],
        "event_type": [],
        "value": [],
        "props": [],
    }
    base = 1_700_000_000_000_000
    for i in range(n):
        rows["event_id"].append(i)
        rows["ts"].append(base + i * 1_000_000)
        rows["user_id"].append(i % 50)
        rows["event_type"].append(rng.choice(["view", "click", "signup"]))
        # two decimals, tiny domain: collisions everywhere
        rows["value"].append(round(rng.randrange(1, domain + 1) * 0.25, 2))
        rows["props"].append("{}")
    table = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "props": pa.array(rows["props"], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return rows


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_mann_whitney_ties_cross_engine_and_textbook(spark, tmp_path, seed):
    d = tmp_path / f"mw{seed}"
    d.mkdir()
    rows = _write_events(d, seed)

    srow = QUERIES["agg_mann_whitney"](spark, str(d)).collect()[0]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    orow = con.sql(ORACLES["agg_mann_whitney"]).fetchone()

    # cross-engine: driver-style 6-decimal stringification must agree
    assert [_fmt(v) for v in (srow.n1, srow.n2, srow.u1, srow.z)] == [
        _fmt(v) for v in orow
    ]

    # textbook brute force on the same data
    a = [v for v, t in zip(rows["value"], rows["event_type"]) if t == "view"]
    b = [v for v, t in zip(rows["value"], rows["event_type"]) if t == "click"]
    combined = a + b
    order = sorted(range(len(combined)), key=lambda i: combined[i])
    ranks = [0.0] * len(combined)
    i = 0
    while i < len(order):
        j = i
        while (
            j + 1 < len(order)
            and combined[order[j + 1]] == combined[order[i]]
        ):
            j += 1
        for k in range(i, j + 1):
            ranks[order[k]] = (i + j + 2) / 2.0
        i = j + 1
    n1, n2 = len(a), len(b)
    u1 = sum(ranks[:n1]) - n1 * (n1 + 1) / 2.0
    tie = sum(c**3 - c for c in Counter(combined).values())
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert (srow.n1, srow.n2) == (n1, n2)
    assert abs(srow.u1 - u1) < 1e-9
    assert abs(srow.z - z) < 1e-6


@pytest.mark.parametrize("seed", [3, 11])
def test_ks_ties_cross_engine(spark, tmp_path, seed):
    d = tmp_path / f"ks{seed}"
    d.mkdir()
    _write_events(d, seed)

    srow = QUERIES["agg_ks_test"](spark, str(d)).collect()[0]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    orow = con.sql(ORACLES["agg_ks_test"]).fetchone()
    got = (srow.n1, srow.n2, srow.d_num, srow.ks_d, srow.ks_at)
    assert [_fmt(v) for v in got] == [_fmt(v) for v in orow]
