"""Focused equivalence test for the r12 funnel_conversion respelling.

The optimization round respelled funnel_conversion from per-level
existential joins (seven events scans, three distinct-shuffles, three
join-shuffles) into ONE user_id-keyed aggregation over per-user sorted
timestamp arrays — the ClickHouse windowFunnel execution shape. This
pins that the aggregate spelling is VALUE-identical to the legacy join
spelling on adversarial event logs: exact one-hour boundary hits
(inclusive upper bound), duplicate timestamps, clicks before views,
purchases tied to the earliest vs a later click, null timestamps, and
users with only one or two of the three step types.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_T0 = dt.datetime(2030, 1, 1, 0, 0, 0)

# Offsets clustered around the 3600-second window edge so the strict
# lower / inclusive upper bounds actually decide levels; a None offset
# makes a null-ts row.
_OFFSET = st.one_of(
    st.none(),
    st.sampled_from([0, 1, 2, 1799, 3598, 3599, 3600, 3601, 7200]),
)
_EVENT = st.tuples(
    st.integers(min_value=1, max_value=4),  # user_id
    st.sampled_from(["view", "click", "purchase", "error"]),
    _OFFSET,
)


def _legacy_funnel(e):
    """The pre-r12 join spelling, verbatim (the shape the shared DuckDB
    oracle still uses)."""
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("cts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    hour = F.expr("INTERVAL 1 HOUR")
    u = e.select("user_id").distinct()
    lvl1 = v.select("user_id").distinct().withColumn("l1", F.lit(1))
    lvl2 = (
        v.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + hour),
        )
        .select("user_id")
        .distinct()
        .withColumn("l2", F.lit(1))
    )
    lvl3 = (
        v.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + hour),
        )
        .join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("pts") > F.col("cts"))
            & (F.col("pts") <= F.col("vts") + hour),
        )
        .select("user_id")
        .distinct()
        .withColumn("l3", F.lit(1))
    )
    return (
        u.join(lvl1, "user_id", "left")
        .join(lvl2, "user_id", "left")
        .join(lvl3, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("l3").isNotNull(), 3)
            .when(F.col("l2").isNotNull(), 2)
            .when(F.col("l1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("funnel_level"),
        )
    )


@given(events=st.lists(_EVENT, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_aggregate_funnel_equals_join_funnel(spark, tmp_path_factory, events):
    from go_nats_to_clickhouse_spark.queries.behavioral import funnel_conversion

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (
            uid,
            typ,
            None if off is None else _T0 + dt.timedelta(seconds=off),
        )
        for uid, typ, off in events
    ]
    # single parquet FILE with us timestamps, like the real fixtures
    # (load_table probes the file's timestamp unit with pyarrow)
    table = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    sf_dir = str(tmp_path_factory.mktemp("funnel"))
    pq.write_table(table, f"{sf_dir}/events.parquet")

    got = {
        (r["user_id"], r["funnel_level"])
        for r in funnel_conversion(spark, sf_dir).collect()
    }
    want = {
        (r["user_id"], r["funnel_level"])
        for r in _legacy_funnel(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
    }
    assert got == want
