"""Round-8 second-batch tests: partition lifecycle (DETACH / ATTACH /
MOVE PARTITION TO TABLE), the ip_trie longest-prefix dictionary, LIMIT n
BY, and filtered vector search."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans.layout import (
    attach_partition,
    detach_partition,
    move_partition_to_table,
)
from go_nats_to_clickhouse_spark.queries import QUERIES


def _parquet_files(path: str) -> list[str]:
    out = []
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        out += [
            os.path.join(dirpath, f)
            for f in filenames
            if f.endswith(".parquet")
        ]
    return sorted(out)


class TestPartitionLifecycle:
    def _mk_table(self, spark, tmp_path) -> str:
        path = str(tmp_path / "t")
        rows = [(i, i % 3, i * 10) for i in range(30)]
        (
            spark.createDataFrame(rows, "id long, d int, v long")
            .write.partitionBy("d")
            .parquet(path)
        )
        return path

    def test_detach_hides_and_attach_restores(self, spark, tmp_path):
        path = self._mk_table(spark, tmp_path)
        # pin an untouched partition's file inodes: lifecycle ops must
        # never rewrite parquet bytes, only rename directories
        keeper = _parquet_files(os.path.join(path, "d=0"))
        pins = {f: os.stat(f).st_mtime_ns for f in keeper}

        detach_partition(path, "d", 1)
        got = spark.read.parquet(path)
        assert sorted(
            r.d for r in got.select("d").distinct().collect()
        ) == [0, 2]
        assert got.count() == 20
        # the detached dir itself is invisible to Spark's listing
        assert os.path.isdir(os.path.join(path, "_detached", "d=1"))

        attach_partition(path, "d", 1)
        back = spark.read.parquet(path)
        assert back.count() == 30
        assert back.agg(F.sum("v")).first()[0] == sum(i * 10 for i in range(30))
        assert {f: os.stat(f).st_mtime_ns for f in keeper} == pins

    def test_move_partition_to_table(self, spark, tmp_path):
        src = self._mk_table(spark, tmp_path)
        dest = str(tmp_path / "archive")
        moved = move_partition_to_table(src, dest, "d", 2)
        assert os.path.isdir(moved)
        assert spark.read.parquet(src).count() == 20
        d = spark.read.parquet(dest)
        assert d.count() == 10
        assert [r.d for r in d.select("d").distinct().collect()] == [2]

    def test_lifecycle_guards(self, spark, tmp_path):
        path = self._mk_table(spark, tmp_path)
        with pytest.raises(FileNotFoundError):
            detach_partition(path, "d", 9)
        with pytest.raises(FileNotFoundError):
            attach_partition(path, "d", 0)  # not detached
        detach_partition(path, "d", 0)
        with pytest.raises(FileNotFoundError):
            detach_partition(path, "d", 0)  # no longer active
        os.makedirs(os.path.join(path, "d=0"))
        with pytest.raises(FileExistsError):
            detach_partition(path, "d", 0)  # detached name taken
        with pytest.raises(FileExistsError):
            attach_partition(path, "d", 0)  # active name taken

    def test_driver_row_state(self, spark, sf_dir):
        """Day 3 stays detached (invisible), day 2 round-tripped back,
        day 10 lives only in the archive table."""
        got = QUERIES["table_detach_attach_partition"](spark, sf_dir)
        rows = {(r.tbl, r.day): r.n_rows for r in got.collect()}
        days = {d for (_, d) in rows}
        assert 20240103 not in days
        assert ("base", 20240102) in rows
        assert ("dest", 20240110) in rows and ("base", 20240110) not in rows
        assert all(t == "dest" for (t, d) in rows if d == 20240110)


#: user_ids whose Knuth-hash IPv4 lands in each dictionary network
#: (found by direct search; the corp-eu id is the LPM nesting case —
#: its address also matches corp/8 and internet/0)
_UID = {
    "internet": 1,
    "cgnat": 177,
    "corp": 33927,
    "private": 35619,
    "corp-eu": 44873,
}


class TestIpTrie:
    def test_longest_prefix_wins(self, spark, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        uids = list(_UID.values())
        pdf = pd.DataFrame(
            {
                "event_id": range(len(uids)),
                "ts": pd.to_datetime("2024-01-01").as_unit("us"),
                "user_id": uids,
                "event_type": "click",
                "value": 1.0,
                "props": "{}",
            }
        )
        path = str(tmp_path / "fx")
        os.makedirs(path)
        # one FILE, like the driver fixtures (load_table probes the
        # footer schema with pyarrow, which needs a file path)
        pq.write_table(
            pa.Table.from_pandas(pdf), os.path.join(path, "events.parquet")
        )
        got = {
            r.network: (r.n_events, r.value_cents)
            for r in QUERIES["join_dict_ip_trie"](spark, path).collect()
        }
        # one event per network; the corp-eu event must NOT fall back to
        # corp or internet (longest match), the corp one must not take
        # corp-eu (no false nesting), every event classifies (catch-all)
        assert got == {name: (1, 100) for name in _UID}


class TestLimitBy:
    def test_at_most_n_per_group_and_global_limit(self, spark, sf_dir):
        got = QUERIES["sort_limit_by"](spark, sf_dir).collect()
        assert len(got) <= 100
        per_cust: dict[int, int] = {}
        for r in got:
            per_cust[r.o_custkey] = per_cust.get(r.o_custkey, 0) + 1
        assert max(per_cust.values()) <= 2
        # survivors really are each customer's top orders: descending
        # global order is already oracle-checked; spot the per-group rule
        prices = [r.price_cents for r in got]
        assert prices == sorted(prices, reverse=True)

    def test_window_group_limit_in_plan(self, spark, sf_dir):
        """The rank<=n filter must compile to WindowGroupLimit (partial
        per-map-task top-n BEFORE the shuffle) — the plan property the
        docstring's 100-TB claim rests on."""
        df = QUERIES["sort_limit_by"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestFilteredAnn:
    def test_exact_neighbors_satisfy_predicate(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.queries.util import load_table

        got = QUERIES["vector_ann_filtered_topk"](spark, sf_dir)
        labels = load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("neighbor_id"), "label"
        )
        bad = got.join(labels, "neighbor_id").filter(
            F.pmod(F.col("label"), F.lit(2)) != 0
        )
        assert bad.count() == 0
        # pre-filtering fills k for every query
        per_q = got.groupBy("query_id").count().collect()
        assert len(per_q) == 8 and all(r["count"] == 5 for r in per_q)

    def test_index_path_prefilters_and_recalls(self, spark, sf_dir):
        got = QUERIES["vector_ann_filtered_read_topk"](spark, sf_dir)
        rows = got.collect()
        assert len(rows) == 8
        assert all(r.recall_ok for r in rows)

    def test_keep_restricts_ivf_read(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.operators.similarity import (
            ivf_read_topk,
        )
        from go_nats_to_clickhouse_spark.plans.materialize import ann_tables
        from go_nats_to_clickhouse_spark.queries.util import load_table
        from go_nats_to_clickhouse_spark.queries.vector import as_double

        t = ann_tables(spark, sf_dir)
        centers = [
            list(r.center)
            for r in spark.read.parquet(t["ann_centroids"])
            .orderBy("cell")
            .collect()
        ]
        assigned = spark.read.parquet(t["ann_corpus"])
        e = load_table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("qv"),
        )
        allowed = {0, 4, 8, 12, 16, 20, 24, 28, 32, 36}
        keep = spark.createDataFrame(
            [(i,) for i in allowed], "neighbor_id long"
        )
        got = ivf_read_topk(
            q, assigned, centers, nprobe=16, k=3, keep=keep
        ).collect()
        assert got and all(r.neighbor_id in allowed for r in got)


class TestExchangeTables:
    def test_swap_is_total_and_guarded(self, spark, tmp_path):
        from go_nats_to_clickhouse_spark.plans.layout import exchange_tables

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        spark.range(3).write.parquet(a)
        spark.range(7).write.parquet(b)
        exchange_tables(a, b)
        assert spark.read.parquet(a).count() == 7
        assert spark.read.parquet(b).count() == 3
        with pytest.raises(FileNotFoundError):
            exchange_tables(a, str(tmp_path / "missing"))

    def test_driver_row_swapped_directions(self, spark, sf_dir):
        got = QUERIES["table_exchange_tables"](spark, sf_dir)
        agg = got.groupBy("tbl").agg(
            F.max("day").alias("mx"), F.sum("n_rows").alias("n")
        )
        rows = {r.tbl: (r.mx, r.n) for r in agg.collect()}
        # live serves the COMPLETE aggregate, staged holds the stale
        # prefix — i.e. the swap moved both directions
        assert rows["staged"][0] <= 20240121
        assert rows["live"][0] > 20240121
        assert rows["live"][1] > rows["staged"][1]


class TestFreezeRestoreRow:
    def test_restored_equals_raw(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.queries.util import load_table

        got = QUERIES["table_freeze_restore"](spark, sf_dir)
        raw = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .orderBy("event_type")
        )
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in raw.collect()
        ]


class TestWithTies:
    def test_equals_rank_spelling(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.queries.util import load_table
        from pyspark.sql.window import Window as W

        got = QUERIES["sort_limit_with_ties"](spark, sf_dir)
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("price_cents"),
        )
        naive = (
            o.withColumn(
                "rk", F.rank().over(W.orderBy(F.desc("o_orderdate")))
            )
            .filter(F.col("rk") <= 10)
            .drop("rk")
            .orderBy(F.desc("o_orderdate"), "o_orderkey")
        )
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in naive.collect()
        ]


class TestSelectionCurve:
    def test_distributed_ntile_equals_native(self, spark, sf_dir):
        """The histogram-rank + integer-arithmetic bucket assignment must
        reproduce the single-reducer NTILE(10) window exactly."""
        from go_nats_to_clickhouse_spark.queries.util import load_table
        from pyspark.sql.window import Window as W

        got = QUERIES["text_selection_curve"](spark, sf_dir)
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
        )
        native = (
            d.withColumn(
                "decile",
                F.ntile(10).over(W.orderBy(F.desc("n_words"), "doc_id")),
            )
            .groupBy("decile")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars_total"),
            )
            .orderBy("decile")
        )
        left = [(r.decile, r.n_docs, r.chars_total) for r in got.collect()]
        right = [tuple(r) for r in native.collect()]
        assert left == right
        # curve is monotone and ends at exactly 1e6 ppm
        ppm = [r.cum_chars_ppm for r in got.collect()]
        assert ppm == sorted(ppm) and ppm[-1] == 1000000


class TestCompactedLiveCascade:
    def test_health_row_and_entity_equality(self, spark, sf_dir):
        """The mid-stream compaction logged a maintenance health row, and
        the final warehouse holds exactly the full batch's entities —
        the merge was invisible to the data."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.materialize import (
            NEW_SOURCES,
            cascade_compacted_live_tables,
        )
        from go_nats_to_clickhouse_spark.queries.util import load_table
        from go_nats_to_clickhouse_spark.streaming.pipeline import (
            ANALYTICS_TABLE,
            HEALTH_TABLE,
        )

        t = cascade_compacted_live_tables(spark, sf_dir)
        health = spark.read.parquet(
            _os.path.join(t["warehouse"], HEALTH_TABLE)
        ).filter(F.col("family") == "compact_cascade")
        rows = health.collect()
        assert len(rows) == 1
        assert rows[0].rows_in == rows[0].rows_out > 0

        ana = spark.read.parquet(
            _os.path.join(t["warehouse"], ANALYTICS_TABLE)
        )
        got_ids = {
            int(r.message_id)
            for r in ana.select("message_id").distinct().collect()
        }
        want_ids = {
            r.doc_id
            for r in load_table(spark, sf_dir, "documents")
            .filter(F.col("source").isin(*NEW_SOURCES))
            .select("doc_id")
            .collect()
        }
        # both phases present (phase B landed AFTER the compaction), no
        # row lost or duplicated across the merge
        assert got_ids == want_ids
        assert ana.count() == len(want_ids)


class TestCompactionPreservesDetached:
    def test_detached_partition_survives_compact(self, spark, tmp_path):
        """Background merges must not destroy detached parts (ClickHouse
        keeps `detached/` across merges): compact_table's whole-dir swap
        carries `_`-prefixed sidecars into the new generation."""
        from go_nats_to_clickhouse_spark.plans.layout import compact_table

        path = str(tmp_path / "t")
        rows = [(i, i % 3, i * 10) for i in range(30)]
        (
            spark.createDataFrame(rows, "id long, d int, v long")
            .repartition(4)
            .write.partitionBy("d")
            .parquet(path)
        )
        detach_partition(path, "d", 1)
        compact_table(
            spark, path, sort_keys=("id",), partition_cols=("d",)
        )
        # the merge rewrote the visible partitions...
        assert spark.read.parquet(path).count() == 20
        # ...and the detached part survived it, still attachable
        assert os.path.isdir(os.path.join(path, "_detached", "d=1"))
        attach_partition(path, "d", 1)
        assert spark.read.parquet(path).count() == 30


class TestMutationsSkipDetached:
    def test_erase_where_leaves_detached_untouched(self, spark, tmp_path):
        """ALTER DELETE rewrites only ACTIVE parts: a detached partition
        keeps its (unmutated) rows and returns intact on ATTACH — the
        ClickHouse contract; erasing detached data requires attaching or
        dropping it explicitly."""
        from go_nats_to_clickhouse_spark.plans.layout import erase_where

        path = str(tmp_path / "t")
        rows = [(i, i % 3, i * 10) for i in range(30)]
        (
            spark.createDataFrame(rows, "id long, d int, v long")
            .write.partitionBy("d")
            .parquet(path)
        )
        detach_partition(path, "d", 1)
        stats = erase_where(
            spark, path, F.col("id") % 2 == 0, sort_keys=("id",)
        )
        assert stats["rows_erased"] == 10  # evens of d=0 (5) + d=2 (5)
        attach_partition(path, "d", 1)
        back = spark.read.parquet(path)
        # the detached partition returned with ALL its rows, evens included
        assert back.filter((F.col("d") == 1) & (F.col("id") % 2 == 0)).count() == 5
        assert back.count() == 20  # 20 active - 10 erased + 10 attached


class TestDetachedPartsReport:
    def test_reports_detached_only(self, spark, tmp_path):
        from go_nats_to_clickhouse_spark.plans.layout import (
            detached_parts_report,
        )

        path = str(tmp_path / "t")
        rows = [(i, i % 3, i * 10) for i in range(30)]
        (
            spark.createDataFrame(rows, "id long, d int, v long")
            .write.partitionBy("d")
            .parquet(path)
        )
        assert detached_parts_report(spark, path, "d").count() == 0
        detach_partition(path, "d", 1)
        detach_partition(path, "d", 2)
        got = {
            r.part: (r.n_rows, r.n_files)
            for r in detached_parts_report(spark, path, "d").collect()
        }
        assert set(got) == {"1", "2"}
        assert all(n_rows == 10 and n_files >= 1 for n_rows, n_files in got.values())


class TestCompactionCrashRecovery:
    def test_leftover_old_generation_sidecars_are_rescued(
        self, spark, tmp_path
    ):
        """Simulate a crash between compact_table's swap and its sidecar
        carry: the retired generation (``__compact_old``) still holds
        ``_detached/``. The NEXT compaction must rescue those parts
        before sweeping the leftover, not rmtree them."""
        import shutil

        from go_nats_to_clickhouse_spark.plans.layout import compact_table

        path = str(tmp_path / "t")
        rows = [(i, i % 3, i * 10) for i in range(30)]
        (
            spark.createDataFrame(rows, "id long, d int, v long")
            .write.partitionBy("d")
            .parquet(path)
        )
        detach_partition(path, "d", 1)
        # stage the crash: old generation left behind WITH the sidecar,
        # live table missing it (exactly the post-swap pre-carry state)
        old = path + "__compact_old"
        shutil.copytree(path, old)
        shutil.rmtree(os.path.join(path, "_detached"))
        compact_table(spark, path, sort_keys=("id",), partition_cols=("d",))
        assert not os.path.exists(old)
        assert os.path.isdir(os.path.join(path, "_detached", "d=1"))
        attach_partition(path, "d", 1)
        assert spark.read.parquet(path).count() == 30


class TestNtileArithmetic:
    def test_bucket_formula_matches_sql_standard(self):
        """Pure-math pin of the distributed NTILE bucket assignment used
        by text_selection_curve: for any n, the SQL-standard NTILE(k)
        puts the first n%k buckets at floor(n/k)+1 rows and the rest at
        floor(n/k) — the formula must reproduce that for every rank."""
        import random

        rnd = random.Random(8)
        for n in [1, 5, 9, 10, 11, 23, 100] + [
            rnd.randrange(1, 10000) for _ in range(50)
        ]:
            k = 10
            q, m = divmod(n, k)
            big_span = (q + 1) * m

            def bucket(r: int) -> int:
                if r <= big_span:
                    return (r + q) // (q + 1)
                return m + (r - big_span + q - 1) // q

            got = [bucket(r) for r in range(1, n + 1)]
            # SQL-standard NTILE: first m buckets hold q+1, rest hold q
            want = []
            b = 1
            while len(want) < n:
                size = q + 1 if b <= m else q
                want += [b] * size
                b += 1
            assert got == want[:n], (n, got[:20], want[:20])


class TestExchangeGuards:
    def test_stale_xchg_tmp_refuses(self, spark, tmp_path):
        """A leftover __xchg_tmp from a crashed exchange must make the
        next exchange refuse loudly instead of silently shuffling three
        directories around unknown state."""
        from go_nats_to_clickhouse_spark.plans.layout import exchange_tables

        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        spark.range(3).write.parquet(a)
        spark.range(7).write.parquet(b)
        os.makedirs(a + "__xchg_tmp")
        with pytest.raises(FileExistsError):
            exchange_tables(a, b)
        # both tables untouched by the refusal
        assert spark.read.parquet(a).count() == 3
        assert spark.read.parquet(b).count() == 7
