"""Physical-design tests: bucketed co-located joins (no Exchange) and
MergeTree-style compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans import layout
from go_nats_to_clickhouse_spark.plans.bucketing import bucketed_join, write_bucketed
from go_nats_to_clickhouse_spark.schemas import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog can forget dirs from prior sessions; clear them
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8, sort_cols=("o_orderkey",))
    write_bucketed(
        l, "b_lineitem", "l_orderkey", n_buckets=8, sort_cols=("l_orderkey",)
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, bucketed_tables):
        bo, bl = bucketed_tables
        # Disable auto-broadcast: at test scale the planner would broadcast
        # (and rightly skip bucketed scans); the property under test is the
        # big-big case where both sides are fact-sized.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = (
                spark.table(bl)
                .join(
                    spark.table(bo),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .select("l_orderkey", "o_totalprice", "l_quantity")
            )
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # co-located: the whole point — no shuffle on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan

    def test_join_result_correct(self, spark, sf_dir, bucketed_tables):
        bo, bl = bucketed_tables
        n_bucketed = (
            spark.table(bl)
            .join(spark.table(bo), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        n_plain = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n_bucketed == n_plain


class TestCompaction:
    def test_compact_merges_small_files(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "tbl")
        e = load_table(spark, sf_dir, "events").select(
            F.col("ts").alias("timestamp"),
            F.lit("s.u.b").alias("subject"),
            F.col("user_id").cast("string").alias("chat_id"),
            F.col("event_id").alias("sequence"),
            F.lit("{}").alias("metadata"),
            F.col("props").alias("data"),
        )
        # simulate many micro-batch appends -> many small files
        for chunk in range(4):
            layout.write_partitioned(
                e.filter(F.col("sequence") % 4 == chunk), path, layout.SORT_KEYS["raw"]
            )
        before = spark.read.parquet(path).count()

        def n_files():
            total = 0
            for root, _dirs, files in os.walk(path):
                total += sum(1 for f in files if f.endswith(".parquet"))
            return total

        files_before = n_files()
        layout.compact_table(spark, path, layout.SORT_KEYS["raw"])
        after = spark.read.parquet(path).count()
        assert after == before  # lossless
        assert n_files() < files_before  # fewer, larger files

    def test_partition_pruning_on_ym(self, spark, sf_dir, tmp_path):
        path = str(tmp_path / "pruned")
        e = load_table(spark, sf_dir, "events").select(
            F.col("ts").alias("timestamp"),
            F.lit("s").alias("subject"),
            F.lit("c").alias("chat_id"),
            F.col("event_id").alias("sequence"),
            F.lit("{}").alias("metadata"),
            F.lit("{}").alias("data"),
        )
        layout.write_partitioned(e, path, layout.SORT_KEYS["raw"])
        df = layout.read_table(spark, path).filter(F.col("ym") == 202401)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # the ym predicate must prune at planning time, not filter rows
        assert "PartitionFilters: [isnotnull(ym" in plan


class TestTableMaintenance:
    def _events_table(self, spark, sf_dir, tmp_path, name):
        path = str(tmp_path / name)
        e = load_table(spark, sf_dir, "events").select(
            F.col("ts").alias("timestamp"),
            F.lit("s.u.b").alias("subject"),
            F.col("user_id").cast("string").alias("chat_id"),
            F.col("event_id").alias("sequence"),
            F.lit("{}").alias("metadata"),
            F.col("props").alias("data"),
        )
        layout.write_partitioned(e, path, layout.SORT_KEYS["raw"])
        return path

    def test_expire_partitions_drops_only_old_months(
        self, spark, sf_dir, tmp_path
    ):
        # the sf0.001 fixture spans one month; spread rows across three
        path = str(tmp_path / "ttl")
        e = load_table(spark, sf_dir, "events").select(
            F.when(
                F.col("event_id") % 3 == 0,
                F.col("ts") - F.expr("INTERVAL 70 DAYS"),
            )
            .when(
                F.col("event_id") % 3 == 1,
                F.col("ts") - F.expr("INTERVAL 35 DAYS"),
            )
            .otherwise(F.col("ts"))
            .alias("timestamp"),
            F.lit("s").alias("subject"),
            F.col("user_id").cast("string").alias("chat_id"),
            F.col("event_id").alias("sequence"),
            F.lit("{}").alias("metadata"),
            F.col("props").alias("data"),
        )
        layout.write_partitioned(e, path, layout.SORT_KEYS["raw"])
        df = spark.read.parquet(path)
        months = sorted(r[0] for r in df.select("ym").distinct().collect())
        assert len(months) >= 2
        cutoff = months[-1]  # keep only the newest month
        keep_count = df.filter(F.col("ym") >= cutoff).count()

        dropped = layout.expire_partitions(path, before_ym=cutoff)
        assert dropped == months[:-1]
        remaining = spark.read.parquet(path)
        assert sorted(
            r[0] for r in remaining.select("ym").distinct().collect()
        ) == [cutoff]
        assert remaining.count() == keep_count
        # idempotent: second run drops nothing
        assert layout.expire_partitions(path, before_ym=cutoff) == []

    def test_erase_keys_rewrites_only_affected_partitions(
        self, spark, sf_dir, tmp_path
    ):
        import os as _os

        path = self._events_table(spark, sf_dir, tmp_path, "gdpr")
        df = spark.read.parquet(path)
        total = df.count()
        victim = df.select("chat_id").first()[0]
        victim_rows = df.filter(F.col("chat_id") == victim).count()
        affected_yms = {
            r[0]
            for r in df.filter(F.col("chat_id") == victim)
            .select("ym")
            .distinct()
            .collect()
        }
        # mtime of an untouched partition must not change
        untouched = [
            d
            for d in _os.listdir(path)
            if d.startswith("ym=") and int(d.split("=")[1]) not in affected_yms
        ]
        mtimes_before = {
            d: _os.stat(_os.path.join(path, d)).st_mtime for d in untouched
        }

        stats = layout.erase_keys(
            spark, path, "chat_id", [victim], layout.SORT_KEYS["raw"]
        )
        assert stats["rows_erased"] == victim_rows
        assert stats["partitions_rewritten"] == len(affected_yms)
        after = spark.read.parquet(path)
        assert after.filter(F.col("chat_id") == victim).count() == 0
        assert after.count() == total - victim_rows
        for d in untouched:
            assert (
                _os.stat(_os.path.join(path, d)).st_mtime == mtimes_before[d]
            ), f"untouched partition {d} was rewritten"
        # erasing a nonexistent key is a no-op
        assert layout.erase_keys(
            spark, path, "chat_id", ["__nope__"], layout.SORT_KEYS["raw"]
        ) == {"partitions_rewritten": 0, "rows_erased": 0}

    def test_crashed_swap_leftovers_are_invisible_to_reads(
        self, spark, sf_dir, tmp_path
    ):
        """A crash between os.rename(part, old) and rmtree(old) must not
        resurrect erased rows: staging dirs are '.'-prefixed and '='-free
        so partition inference skips them (a '_' prefix alone is NOT
        enough: dir names containing '=' are still parsed and conflict —
        empirically verified; ADVICE r4 medium). Simulates the worst-case leftover — a full
        pre-erase copy of a partition sitting inside the table root."""
        import os as _os
        import shutil as _sh

        path = self._events_table(spark, sf_dir, tmp_path, "crash")
        clean_count = spark.read.parquet(path).count()
        part = next(d for d in _os.listdir(path) if d.startswith("ym="))
        ym = part.split("=", 1)[1]
        for leftover in (
            f".erase_old-ym-{ym}",
            f".upsert_old-ym-{ym}",
            f".erase_tmp-ym-{ym}",
        ):
            _sh.copytree(_os.path.join(path, part), _os.path.join(path, leftover))
        # the leftovers are invisible: same count, same ym domain
        after = spark.read.parquet(path)
        assert after.count() == clean_count
        assert all(
            str(r[0]).isdigit() for r in after.select("ym").distinct().collect()
        )
        # and the next maintenance pass still works (sweeps its own leftover)
        victim = after.select("chat_id").first()[0]
        stats = layout.erase_keys(
            spark, path, "chat_id", [victim], layout.SORT_KEYS["raw"]
        )
        assert stats["partitions_rewritten"] >= 1
        assert spark.read.parquet(path).filter(
            F.col("chat_id") == victim
        ).count() == 0

    def test_upsert_latest_wins_and_prunes_partitions(
        self, spark, sf_dir, tmp_path
    ):
        import os as _os

        path = self._events_table(spark, sf_dir, tmp_path, "upsert")
        base = spark.read.parquet(path)
        total = base.count()
        months = sorted(r[0] for r in base.select("ym").distinct().collect())

        # update 3 existing keys (same chat, same sequence, new payload)
        victims = [
            (r["chat_id"], r["sequence"])
            for r in base.select("chat_id", "sequence").limit(3).collect()
        ]
        cond = None
        for c, s in victims:
            one = (F.col("chat_id") == c) & (F.col("sequence") == s)
            cond = one if cond is None else (cond | one)
        upd = (
            base.filter(cond)
            .drop("ym")
            .withColumn("data", F.lit('{"updated": true}'))
        )
        affected_yms = {
            r[0]
            for r in layout.with_partition_col(upd)
            .select("ym")
            .distinct()
            .collect()
        }
        untouched = [
            d
            for d in _os.listdir(path)
            if d.startswith("ym=") and int(d.split("=")[1]) not in affected_yms
        ]
        mtimes = {
            d: _os.stat(_os.path.join(path, d)).st_mtime for d in untouched
        }

        stats = layout.upsert_partitioned(
            spark,
            path,
            upd,
            key_cols=("chat_id", "sequence"),
            sort_keys=layout.SORT_KEYS["raw"],
        )
        assert stats["rows_upserted"] == 3
        assert stats["partitions_rewritten"] == len(affected_yms)
        after = spark.read.parquet(path)
        assert after.count() == total  # replaced, not duplicated
        for c, s in victims:
            row = after.filter(
                (F.col("chat_id") == c) & (F.col("sequence") == s)
            ).collect()
            assert len(row) == 1 and row[0]["data"] == '{"updated": true}'
        for d in untouched:
            assert _os.stat(_os.path.join(path, d)).st_mtime == mtimes[d]
        assert sorted(
            r[0] for r in after.select("ym").distinct().collect()
        ) == months

    def test_read_final_keeps_latest_version(self, spark, sf_dir, tmp_path):
        path = self._events_table(spark, sf_dir, tmp_path, "final")
        base = spark.read.parquet(path)
        # append DUPLICATE keys with a later timestamp (at-least-once replay)
        dup = (
            base.drop("ym")
            .limit(5)
            .withColumn("timestamp", F.col("timestamp") + F.expr("INTERVAL 1 HOUR"))
            .withColumn("data", F.lit('{"v": 2}'))
        )
        layout.write_partitioned(dup, path, layout.SORT_KEYS["raw"])
        raw_count = spark.read.parquet(path).count()
        assert raw_count == base.count() + 5  # duplicates present pre-FINAL

        final = layout.read_table_final(
            spark, path, key_cols=("chat_id", "sequence"), version_col="timestamp"
        )
        assert final.count() == base.count()
        dup_keys = [(r["chat_id"], r["sequence"]) for r in dup.collect()]
        for c, s in dup_keys:
            row = final.filter(
                (F.col("chat_id") == c) & (F.col("sequence") == s)
            ).collect()
            assert len(row) == 1 and row[0]["data"] == '{"v": 2}'

    def test_upsert_creates_new_partition_for_new_month(
        self, spark, sf_dir, tmp_path
    ):
        import os as _os

        path = self._events_table(spark, sf_dir, tmp_path, "upsert_new")
        base = spark.read.parquet(path)
        total = base.count()
        months = {r[0] for r in base.select("ym").distinct().collect()}
        # a batch landing in a month the table has never seen
        newrows = (
            base.drop("ym")
            .limit(4)
            .withColumn(
                "timestamp", F.col("timestamp") + F.expr("INTERVAL 90 DAYS")
            )
            .withColumn("sequence", F.col("sequence") + 1_000_000)
        )
        stats = layout.upsert_partitioned(
            spark,
            path,
            newrows,
            key_cols=("chat_id", "sequence"),
            sort_keys=layout.SORT_KEYS["raw"],
        )
        assert stats["rows_upserted"] == 4
        after = spark.read.parquet(path)
        assert after.count() == total + 4
        new_months = {
            r[0] for r in after.select("ym").distinct().collect()
        } - months
        assert len(new_months) >= 1
        for ym in new_months:
            assert _os.path.isdir(_os.path.join(path, f"ym={ym}"))


def test_warehouse_timestamps_are_prunable_micros(spark, sf_dir):
    """The cascade must write INT64 TIMESTAMP(MICROS), never Spark's
    legacy INT96 default: parquet emits NO min/max statistics for INT96
    (deprecated since PARQUET-323), so a time-range predicate could
    never skip a row group on the warehouse tables — silently defeating
    the ORDER BY ... timestamp sort-key pruning story (init.sql:19).
    Pins physical type INT64 + present row-group stats for every
    timestamp column of every cascade table."""
    import os

    import pyarrow.parquet as pq
    import pyarrow.types as pat

    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )

    wh = ingested_index_tables(spark, sf_dir)["warehouse"]
    checked = 0
    for root, _dirs, files in os.walk(wh):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(root, fname))
            arrow = {f.name: f.type for f in pf.schema_arrow}
            for i in range(len(pf.schema)):
                col = pf.schema.column(i)
                typ = arrow.get(col.name)
                if typ is None or not pat.is_timestamp(typ):
                    continue
                assert col.physical_type == "INT64", (
                    f"{root}/{fname}:{col.name} is {col.physical_type}"
                )
                st = pf.metadata.row_group(0).column(i).statistics
                assert st is not None and st.has_min_max, (
                    f"{root}/{fname}:{col.name} lacks row-group stats"
                )
                checked += 1
    assert checked > 0  # the walk actually saw timestamp columns
