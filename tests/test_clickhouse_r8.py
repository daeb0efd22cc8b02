"""Round-8 query additions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries import QUERIES


class TestWeightedMedianTwins:
    def test_udaf_equals_exact_twin(self, spark, sf_dir):
        """The grouped-agg pandas UDAF spelling and the histogram-reduce
        + cumulative-pick spelling are the SAME function (lower weighted
        median, integer cents) — row-for-row equal, so the shared oracle
        pins both and the pair documents only a scale tradeoff, not a
        semantic one."""
        udaf = QUERIES["agg_weighted_median_udaf"](spark, sf_dir).collect()
        exact = QUERIES["agg_weighted_median_exact"](spark, sf_dir).collect()
        assert [r.asDict() for r in udaf] == [r.asDict() for r in exact]
        assert len(exact) > 0

    def test_lower_weighted_median_definition(self, spark, sf_dir):
        """Hand-check one group against the definition: smallest x whose
        cumulative weight reaches half the total."""
        import collections

        from go_nats_to_clickhouse_spark.queries.util import load_table
        from pyspark.sql import functions as F

        li = (
            load_table(spark, sf_dir, "lineitem")
            .select(
                F.col("l_returnflag").alias("flag"),
                F.round(F.col("l_extendedprice") * 100).cast("long").alias("x"),
                F.col("l_quantity").cast("long").alias("w"),
            )
            .where(F.col("flag") == "A")
            .collect()
        )
        hist = collections.Counter()
        for r in li:
            hist[r.x] += r.w
        total = sum(hist.values())
        cum = 0
        expected = None
        for x in sorted(hist):
            cum += hist[x]
            if 2 * cum >= total:
                expected = x
                break
        got = {
            r.flag: r.wmedian_cents
            for r in QUERIES["agg_weighted_median_exact"](spark, sf_dir).collect()
        }
        assert got["A"] == expected


class TestEraseUnderStreaming:
    """The live-erase lifecycle cell (VERDICT r7 #6): erase interleaved
    between micro-batches of the RUNNING composed service must land the
    exact same final index state as the stop-then-erase path."""

    def test_live_equals_stop_then_erase(self, spark, sf_dir):
        """DISTINCT-row equality: the stop-then-erase reference family
        inherits the ingested build's deliberately crash-replayed epoch
        (duplicate index rows — the at-least-once artifact every
        consumer must absorb), while the live run replays nothing — so
        the multisets differ by exactly those duplicates and the
        distinct row sets must be identical."""
        from go_nats_to_clickhouse_spark.plans.materialize import (
            ERI_TABLES,
            erased_ingested_tables,
            erased_live_tables,
        )

        live = erased_live_tables(spark, sf_dir)
        ref = erased_ingested_tables(spark, sf_dir)
        for t in ERI_TABLES:
            a = spark.read.parquet(live[t])
            b = spark.read.parquet(ref[t])
            assert sorted(a.columns) == sorted(b.columns), t
            cols = sorted(a.columns)
            sa = {repr(tuple(r)) for r in a.select(*cols).collect()}
            sb = {repr(tuple(r)) for r in b.select(*cols).collect()}
            assert sa == sb, t
            assert len(sa) > 0, t
            # and the live run itself appended exactly once per doc
            assert a.count() == a.distinct().count(), t

    def test_no_erased_doc_survives_live_run(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.plans.materialize import (
            ERASE_MOD,
            erased_live_tables,
        )

        live = erased_live_tables(spark, sf_dir)
        q = spark.read.parquet(live["doc_quality"])
        assert (
            q.filter(F.pmod(F.col("doc_id"), F.lit(ERASE_MOD)) == 0).count() == 0
        )
        # the post-erase phase-B appends DID land: odd non-erase ids present
        assert (
            q.filter(
                (F.pmod(F.col("doc_id"), F.lit(2)) == 1)
                & (F.pmod(F.col("doc_id"), F.lit(ERASE_MOD)) != 0)
            ).count()
            > 0
        )

    def test_live_health_rows(self, spark, sf_dir):
        """The live run's service_health table records the cascade and
        doc-index batches AND the mid-stream erase maintenance event,
        with conservation: doc_index appends == all batch docs, erase
        rows == the erase-set size."""
        from go_nats_to_clickhouse_spark.plans.materialize import (
            ERASE_MOD,
            NEW_SOURCES,
            erased_live_tables,
        )
        from go_nats_to_clickhouse_spark.schemas import load_table
        from go_nats_to_clickhouse_spark.streaming.pipeline import HEALTH_TABLE

        live = erased_live_tables(spark, sf_dir)
        h = spark.read.parquet(os.path.join(live["warehouse"], HEALTH_TABLE))
        sums = {
            r.family: (r.i, r.o)
            for r in h.groupBy("family")
            .agg(F.sum("rows_in").alias("i"), F.sum("rows_out").alias("o"))
            .collect()
        }
        batch = load_table(spark, sf_dir, "documents").filter(
            F.col("source").isin(*NEW_SOURCES)
        )
        n = batch.count()
        ne = batch.filter(F.pmod(F.col("doc_id"), F.lit(ERASE_MOD)) == 0).count()
        assert sums["cascade"] == (n, n)
        assert sums["doc_index"] == (n, n)
        assert sums["erase_docs"] == (ne, ne)
        # drift is an ANN-only column; the doc-only run carries nulls
        assert h.filter(F.col("drift").isNotNull()).count() == 0


class TestServiceHealthIngested:
    def test_ann_drift_recorded(self, spark, sf_dir):
        """The mixed-payload ingested run records ANN batches with a
        drift ratio near 1 (the held quarter is in-distribution)."""
        from go_nats_to_clickhouse_spark.plans.materialize import (
            ingested_index_tables,
        )
        from go_nats_to_clickhouse_spark.streaming.pipeline import HEALTH_TABLE

        t = ingested_index_tables(spark, sf_dir)
        h = spark.read.parquet(os.path.join(t["warehouse"], HEALTH_TABLE))
        ann = h.filter(F.col("family") == "ann").collect()
        assert len(ann) > 0
        for r in ann:
            assert r.drift is not None
            assert 0.1 < r.drift < 2.0


class TestSummingMerge:
    def test_fully_merged_after_compact(self, spark, sf_dir):
        """After the full summing_compact pass the table is completely
        merged: one stored row per (partition, sorting key) — the state
        an eventually-merging SummingMergeTree only guarantees after
        OPTIMIZE FINAL."""
        from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

        t = tmaint_tables(spark, sf_dir)
        s = spark.read.parquet(t["events_summed"])
        assert s.count() == s.select("ym", "event_type", "user_id").distinct().count()
        # and nothing was lost: cnt sums to the raw event count
        from go_nats_to_clickhouse_spark.schemas import load_table

        raw = load_table(spark, sf_dir, "events").count()
        assert s.agg({"cnt": "sum"}).first()[0] == raw


class TestJoinAnyLeft:
    def test_any_row_is_min_orderkey(self, spark, sf_dir):
        """Deterministic ANY: the attached order is the customer's
        MIN-orderkey order. (The synthetic fixtures give every customer
        at least one order, so the fixture rows are all matched; the
        null branch is pinned on a constructed frame below.)"""
        from go_nats_to_clickhouse_spark.queries import QUERIES
        from go_nats_to_clickhouse_spark.queries.util import load_table

        rows = QUERIES["join_any_left"](spark, sf_dir).collect()
        assert rows and all(r.first_orderkey is not None for r in rows)
        mins = {
            r.o_custkey: r.mk
            for r in load_table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.min("o_orderkey").alias("mk"))
            .collect()
        }
        for r in rows[:50]:
            assert r.first_orderkey == mins[r.c_custkey]

    def test_left_any_null_branch(self, spark):
        """LEFT ANY keeps unmatched left rows with nulls — pinned on a
        constructed frame since the fixtures have no orderless
        customer."""
        left = spark.createDataFrame([(1,), (2,)], "k long")
        right = spark.createDataFrame([(1, 10, 99)], "k long, ok long, price long")
        first = right.groupBy("k").agg(
            F.min("ok").alias("first_ok"),
            F.min_by("price", "ok").alias("first_price"),
        )
        out = {r.k: (r.first_ok, r.first_price)
               for r in left.join(first, "k", "left").collect()}
        assert out[1] == (10, 99)
        assert out[2] == (None, None)


class TestEraseUnderStreamingAnn:
    def test_live_corpus_equals_never_contained(self, spark, sf_dir):
        """After the mid-stream erase + post-erase appends, the cell
        corpus holds exactly (all embeddings) minus (erase set) — no
        erased id anywhere, every surviving id present exactly once."""
        from go_nats_to_clickhouse_spark.plans.materialize import (
            ERASE_MOD,
            erased_live_ann_tables,
        )
        from go_nats_to_clickhouse_spark.schemas import load_table

        t = erased_live_ann_tables(spark, sf_dir)
        corpus = spark.read.parquet(t["ann_corpus"])
        got = sorted(r.neighbor_id for r in corpus.select("neighbor_id").collect())
        want = sorted(
            r.vec_id
            for r in load_table(spark, sf_dir, "embeddings")
            .filter(F.pmod(F.col("vec_id"), F.lit(ERASE_MOD)) != 0)
            .select("vec_id")
            .collect()
        )
        assert got == want

    def test_live_ann_health_rows(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.plans.materialize import (
            ERASE_MOD,
            erased_live_ann_tables,
        )
        from go_nats_to_clickhouse_spark.schemas import load_table
        from go_nats_to_clickhouse_spark.streaming.pipeline import HEALTH_TABLE

        t = erased_live_ann_tables(spark, sf_dir)
        h = spark.read.parquet(os.path.join(t["warehouse"], HEALTH_TABLE))
        e = load_table(spark, sf_dir, "embeddings")
        held = e.filter(F.pmod(F.col("vec_id"), F.lit(4)) == 3)
        n_held = held.count()
        n_erase = e.filter(F.pmod(F.col("vec_id"), F.lit(ERASE_MOD)) == 0).count()
        sums = {
            r.family: (r.i, r.o)
            for r in h.groupBy("family")
            .agg(F.sum("rows_in").alias("i"), F.sum("rows_out").alias("o"))
            .collect()
        }
        # phase B excludes erase-set held vecs: ann appends = held minus
        # (held ∩ erase-set arriving only in phase A... all held erase
        # vecs DID arrive in phase A), so total ann appends = n_held
        assert sums["ann"] == (n_held, n_held)
        assert sums["erase_vectors"] == (n_erase, n_erase)
        # ann batches carry drift ratios; the erase row does not
        ann = h.filter(F.col("family") == "ann")
        assert ann.filter(F.col("drift").isNull()).count() == 0


class TestProjectionRoute:
    def test_router_picks_projection_for_matching_filter(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.plans.layout import read_with_projection
        from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

        t = tmaint_tables(spark, sf_dir)
        projs = {"event_type": t["events_proj_type"]}
        _, chosen = read_with_projection(
            spark, t["events_base"], projs, {"event_type"}
        )
        assert chosen == t["events_proj_type"]
        # un-matched filters fall back to the base layout
        _, chosen2 = read_with_projection(
            spark, t["events_base"], projs, {"user_id"}
        )
        assert chosen2 == t["events_base"]

    def test_projection_scan_prunes_partitions(self, spark, sf_dir):
        """The type-filtered scan over the projection must carry the
        event_type predicate as a PARTITION filter (directory-level
        pruning), which the base monthly layout cannot."""
        from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

        t = tmaint_tables(spark, sf_dir)
        plan = (
            spark.read.parquet(t["events_proj_type"])
            .filter(F.col("event_type") == "click")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in plan and "event_type" in plan.split(
            "PartitionFilters"
        )[1][:200]

    def test_projection_same_rows_as_base(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

        t = tmaint_tables(spark, sf_dir)
        base = spark.read.parquet(t["events_base"]).drop("ym")
        proj = spark.read.parquet(t["events_proj_type"])
        cols = sorted(set(base.columns) & set(proj.columns))
        assert base.count() == proj.count()
        assert (
            base.select(*cols).exceptAll(proj.select(*cols)).count() == 0
        )


class TestUpdateMutation:
    def test_partition_pruned_rewrite(self, spark, tmp_path):
        """ALTER UPDATE rewrites exactly the affected partitions:
        matching rows get the new values, non-matching rows in affected
        partitions are preserved, and untouched partitions' files stay
        byte-identical (mtime-pinned, the erase_keys discipline)."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import update_mutation

        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 3 + 1, "err" if i % 2 == 0 else "ok", 100)
             for i in range(30)],
            "id long, ym int, kind string, cents long",
        )
        df.write.partitionBy("ym").parquet(path)
        p3 = _os.path.join(path, "ym=3")
        mtimes_before = {
            f: _os.stat(_os.path.join(p3, f)).st_mtime_ns
            for f in _os.listdir(p3)
        }
        stats = update_mutation(
            spark,
            path,
            {"cents": F.col("cents") + 900},
            (F.col("kind") == "err") & (F.col("ym") <= 2),
            sort_keys=("id",),
        )
        assert stats["partitions_rewritten"] == 2
        out = spark.read.parquet(path)
        assert (
            out.filter(
                (F.col("kind") == "err") & (F.col("ym") <= 2)
            ).agg(F.min("cents")).first()[0]
            == 1000
        )
        assert (
            out.filter(
                (F.col("kind") == "ok") | (F.col("ym") == 3)
            ).agg(F.max("cents")).first()[0]
            == 100
        )
        assert out.count() == 30
        mtimes_after = {
            f: _os.stat(_os.path.join(p3, f)).st_mtime_ns
            for f in _os.listdir(p3)
        }
        assert mtimes_after == mtimes_before

    def test_no_match_is_noop(self, spark, tmp_path):
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import update_mutation

        path = str(tmp_path / "t2")
        spark.createDataFrame(
            [(1, 1, "ok", 5)], "id long, ym int, kind string, cents long"
        ).write.partitionBy("ym").parquet(path)
        stats = update_mutation(
            spark, path, {"cents": F.lit(0)}, F.col("kind") == "absent",
            sort_keys=("id",),
        )
        assert stats == {"partitions_rewritten": 0, "rows_updated": 0}


class TestLightweightDelete:
    def _table(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(i, i % 3 + 1, "del" if i % 4 == 0 else "keep", i * 10)
             for i in range(40)],
            "id long, ym int, kind string, v long",
        ).write.partitionBy("ym").parquet(path)
        return path

    def test_mask_touches_no_table_file(self, spark, tmp_path):
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import (
            lightweight_delete,
            read_with_mask,
        )

        path = self._table(spark, tmp_path)
        mask = str(tmp_path / "mask")
        before = {
            (d, f): _os.stat(_os.path.join(path, d, f)).st_mtime_ns
            for d in _os.listdir(path)
            if d.startswith("ym=")
            for f in _os.listdir(_os.path.join(path, d))
        }
        n = lightweight_delete(
            spark, path, mask, F.col("kind") == "del", key_cols=("id",)
        )
        assert n == 10
        after = {
            (d, f): _os.stat(_os.path.join(path, d, f)).st_mtime_ns
            for d in _os.listdir(path)
            if d.startswith("ym=")
            for f in _os.listdir(_os.path.join(path, d))
        }
        assert after == before  # the lightweight point: zero table IO
        got = read_with_mask(spark, path, mask, ("id",))
        assert got.count() == 30
        assert got.filter(F.col("kind") == "del").count() == 0

    def test_compaction_makes_it_physical_and_clears_mask(
        self, spark, tmp_path
    ):
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import (
            apply_mask_compact,
            lightweight_delete,
            read_with_mask,
        )

        path = self._table(spark, tmp_path)
        mask = str(tmp_path / "mask")
        lightweight_delete(
            spark, path, mask, F.col("kind") == "del", key_cols=("id",)
        )
        masked = sorted(
            r.id for r in read_with_mask(spark, path, mask, ("id",)).collect()
        )
        stats = apply_mask_compact(spark, path, mask, sort_keys=("id",))
        assert stats["rows_erased"] == 10
        assert not _os.path.exists(mask)
        plain = sorted(r.id for r in spark.read.parquet(path).collect())
        assert plain == masked  # physical state == what the mask served
