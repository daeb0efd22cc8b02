"""Parquet bloom filters as the ClickHouse secondary-skip-index analog
(VERDICT r8 #4; reference init.sql:19's granule skipping beyond the
sort key).

The pins go through parquet-java's own bloom readers
(plans/layout.bloom_skip_report) — the same code path Spark's scan uses
for row-group filtering — so ``excluded`` literally counts row groups a
point lookup skips before decoding a page.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans import layout


def _toy_frame(spark, n=400):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=i % 72), f"key-{i}", i) for i in range(n)
    ]
    return spark.createDataFrame(rows, "timestamp timestamp, k string, v long")


def test_write_partitioned_writes_bloom_on_every_row_group(spark, tmp_path):
    path = str(tmp_path / "t")
    layout.write_partitioned(
        _toy_frame(spark).repartition(4),
        path,
        sort_keys=("timestamp",),
        mode="overwrite",
        bloom_cols=("k",),
    )
    absent = layout.bloom_skip_report(spark, path, "k", "no-such-key")
    assert absent["row_groups"] >= 4
    assert absent["with_bloom"] == absent["row_groups"]
    # an absent key is provably skippable EVERYWHERE
    assert absent["excluded"] == absent["row_groups"]
    present = layout.bloom_skip_report(spark, path, "k", "key-7")
    # ...while a present key's home row group is never excluded
    assert present["excluded"] < present["row_groups"]


def test_compaction_preserves_the_skip_index(spark, tmp_path):
    path = str(tmp_path / "t")
    layout.write_partitioned(
        _toy_frame(spark).repartition(4),
        path,
        sort_keys=("timestamp",),
        mode="overwrite",
        bloom_cols=("k",),
    )
    layout.compact_table(
        spark, path, sort_keys=("timestamp",), bloom_cols=("k",)
    )
    r = layout.bloom_skip_report(spark, path, "k", "no-such-key")
    assert r["row_groups"] >= 1
    assert r["with_bloom"] == r["row_groups"]
    assert r["excluded"] == r["row_groups"]


def test_cascade_point_lookup_skips_row_groups(spark, sf_dir):
    """The driver row's mechanism pin: on the composed-service warehouse,
    a message_id point lookup must (a) find a bloom on every row group,
    (b) skip MOST row groups for a present key (>0 — the VERDICT gate),
    (c) skip ALL of them for an absent key."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import (
        ALL_STREAMS_TABLE,
        ANALYTICS_TABLE,
    )

    t = ingested_index_tables(spark, sf_dir)
    ana = os.path.join(t["warehouse"], ANALYTICS_TABLE)
    present = layout.bloom_skip_report(spark, ana, "message_id", "0")
    assert present["with_bloom"] == present["row_groups"] > 1
    assert 0 < present["excluded"] < present["row_groups"]
    absent = layout.bloom_skip_report(spark, ana, "message_id", "no-such-id")
    assert absent["excluded"] == absent["row_groups"]
    # the union table's chat_id skip index (init.sql:46 table analog)
    alls = os.path.join(t["warehouse"], ALL_STREAMS_TABLE)
    chat = layout.bloom_skip_report(spark, alls, "chat_id", "doc-0")
    assert chat["with_bloom"] == chat["row_groups"]
    assert 0 < chat["excluded"] < chat["row_groups"]


def test_lookup_predicate_reaches_the_scan(spark, sf_dir):
    """The point lookup's IN-list must be pushed to the parquet source
    (PushedFilters) — without that the bloom is never consulted."""
    from go_nats_to_clickhouse_spark.queries import QUERIES

    df = QUERIES["table_skip_index_lookup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "message_id" in plan


def test_erase_where_rebuilds_blooms_on_rewritten_parts(spark, tmp_path):
    path = str(tmp_path / "t")
    layout.write_partitioned(
        _toy_frame(spark).repartition(2),
        path,
        sort_keys=("timestamp",),
        mode="overwrite",
        bloom_cols=("k",),
    )
    layout.erase_where(
        spark,
        path,
        F.col("v") % 7 == 0,
        sort_keys=("timestamp",),
        bloom_cols=("k",),
    )
    r = layout.bloom_skip_report(spark, path, "k", "no-such-key")
    assert r["with_bloom"] == r["row_groups"]
    assert r["excluded"] == r["row_groups"]


def test_timestamp_range_predicate_can_skip_row_groups(spark, tmp_path):
    """Mechanism pin for the INT64-micros write fix (round 10): a
    time-range predicate over an engine-written, timestamp-sorted table
    must be able to exclude row groups via footer min/max statistics —
    the scan planner's data-skipping input. Under Spark's INT96 default
    this was impossible (INT96 carries NO statistics; verified absent
    during the round-10 audit), so this pins both halves: every row
    group exposes ts stats, and a one-hour predicate excludes most
    groups on range-partitioned data."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "ts_sorted")
    frame = _toy_frame(spark, n=1200).repartitionByRange(6, "timestamp")
    layout.write_partitioned(
        frame, path, sort_keys=("timestamp",), mode="overwrite"
    )

    lo = dt.datetime(2024, 1, 2, 5)
    hi = dt.datetime(2024, 1, 2, 6)
    groups = 0
    with_stats = 0
    excluded = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(root, fname))
            ci = [
                i
                for i in range(len(pf.schema))
                if pf.schema.column(i).name == "timestamp"
            ][0]
            assert pf.schema.column(ci).physical_type == "INT64"
            for ri in range(pf.metadata.num_row_groups):
                groups += 1
                st = pf.metadata.row_group(ri).column(ci).statistics
                if st is None or not st.has_min_max:
                    continue
                with_stats += 1
                gmin = st.min.replace(tzinfo=None)
                gmax = st.max.replace(tzinfo=None)
                if gmax < lo or gmin > hi:
                    excluded += 1
    assert groups >= 6
    assert with_stats == groups  # the INT96 regression would zero this
    assert excluded >= groups - 2  # disjoint ranges: most groups skip
