from __future__ import annotations

import os

import pytest

from go_nats_to_clickhouse_spark.config import EngineConfig
from go_nats_to_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    cfg = EngineConfig(master="local[4]", shuffle_partitions=4)
    spark = get_spark(cfg, app_name="gntcs-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def classical_decomposition_model(counts: dict[int, int]):
    """Shared exact integer reference for timeseries_decompose_seasonal
    (used by test_clickhouse_r10 and test_property_r10_stats so the two
    pins cannot drift apart): given {hour_idx: event count}, returns
    (lo, xs, trend2, s48, cs) over the densified grid — trend2[i] is the
    exact 48x centered 2x24 MA at grid offset i, s48/cs the per
    hour-of-day detrended integer sums and counts."""
    lo, hi = min(counts), max(counts)
    xs = [counts.get(h, 0) for h in range(lo, hi + 1)]
    trend2 = {
        i: xs[i - 12] + 2 * sum(xs[i - 11 : i + 12]) + xs[i + 12]
        for i in range(12, len(xs) - 12)
    }
    s48: dict[int, int] = {}
    cs: dict[int, int] = {}
    for i, t2 in trend2.items():
        hod = (lo + i) % 24
        s48[hod] = s48.get(hod, 0) + (48 * xs[i] - t2)
        cs[hod] = cs.get(hod, 0) + 1
    return lo, xs, trend2, s48, cs


@pytest.fixture(scope="session")
def decompose_model():
    return classical_decomposition_model
