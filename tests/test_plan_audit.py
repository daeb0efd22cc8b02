"""Every registered query's physical plan must stay free of scale red
flags (tools/planaudit.py): no shuffled cartesian products, no
row-at-a-time Python UDFs — the static part of the 100 TB posture.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from planaudit import audit_plan, formatted_plan  # noqa: E402

from go_nats_to_clickhouse_spark.queries import QUERIES  # noqa: E402


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_flags(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    flags, _ = audit_plan(formatted_plan(df))
    assert not flags, f"{name}: {flags}"
