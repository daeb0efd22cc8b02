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
