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


class TestCollapsingMergeTree:
    def _table(self, spark, tmp_path):
        """3 users, each with a sequence of state updates written per the
        CollapsingMergeTree writer contract: +1 state row per update, -1
        cancel row copying the previous state; bucketed by user."""
        path = str(tmp_path / "cl")
        rows = []
        for uid, states in ((1, [10, 20, 30]), (2, [5]), (3, [7, 7])):
            prev = None
            for ver, cents in enumerate(states):
                if prev is not None:
                    rows.append((uid, prev[0], prev[1], -1))
                rows.append((uid, ver, cents, 1))
                prev = (ver, cents)
        df = spark.createDataFrame(
            rows, "user_id long, version long, value_cents long, sign int"
        ).withColumn("ub", F.pmod("user_id", F.lit(2)).cast("int"))
        df.write.partitionBy("ub").parquet(path)
        return path

    def _read_final(self, spark, path):
        return {
            r.user_id: (r.value_cents, r.live)
            for r in spark.read.parquet(path)
            .groupBy("user_id")
            .agg(
                F.sum(F.col("value_cents") * F.col("sign")).alias("value_cents"),
                F.sum("sign").alias("live"),
            )
            .filter(F.col("live") > 0)
            .collect()
        }

    def test_read_discipline_same_before_and_after_merge(
        self, spark, tmp_path
    ):
        """The SUM(col*sign)/HAVING SUM(sign)>0 read returns the SAME
        answer on the raw appended table and on the compacted one —
        merges are eventual in ClickHouse and a correct reader never
        depends on them having run."""
        from go_nats_to_clickhouse_spark.plans.layout import (
            collapsing_compact,
        )

        path = self._table(spark, tmp_path)
        before = self._read_final(spark, path)
        collapsing_compact(spark, path, partition_col="ub")
        after = self._read_final(spark, path)
        assert before == after == {1: (30, 1), 2: (5, 1), 3: (7, 1)}

    def test_merge_collapses_to_net_state(self, spark, tmp_path):
        """After one full compaction pass the table holds exactly one
        live row per user (2N-U rows before), and every stored sign is
        +1 — all cancel pairs annihilated."""
        from go_nats_to_clickhouse_spark.plans.layout import (
            collapsing_compact,
        )

        path = self._table(spark, tmp_path)
        assert spark.read.parquet(path).count() == 9  # 6 states + 3 cancels
        stats = collapsing_compact(spark, path, partition_col="ub")
        assert stats["rows_before"] == 9 and stats["rows_after"] == 3
        out = spark.read.parquet(path)
        assert out.count() == 3
        assert out.agg(F.min("sign"), F.max("sign")).first() == (1, 1)

    def test_driver_row_matches_latest_event(self, spark, sf_dir):
        """events_collapsing end-to-end: the collapsed read equals
        latest-event-per-user computed from the raw fixture."""
        from go_nats_to_clickhouse_spark.queries.util import load_table

        got = {
            r.user_id: r.value_cents
            for r in QUERIES["table_collapsing_read"](spark, sf_dir).collect()
        }
        want = {
            r.user_id: r.cents
            for r in load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.max_by(
                    F.round(F.col("value") * 100).cast("long"), "event_id"
                ).alias("cents")
            )
            .collect()
        }
        assert got == want


class TestTtlRollup:
    def test_rollup_downsamples_aged_partitions_only(self, spark, tmp_path):
        """Aged partitions collapse to one row per group with exact
        summed measures; live partitions' files stay byte-identical."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import ttl_rollup

        path = str(tmp_path / "ru")
        spark.createDataFrame(
            [(i, i % 4 + 1, "a" if (i // 4) % 2 == 0 else "b", 10, 1)
             for i in range(40)],
            "id long, ym int, kind string, cents long, cnt long",
        ).write.partitionBy("ym").parquet(path)
        live = _os.path.join(path, "ym=4")
        mtimes_before = {
            f: _os.stat(_os.path.join(live, f)).st_mtime_ns
            for f in _os.listdir(live)
        }
        stats = ttl_rollup(
            spark,
            path,
            before_part=4,
            group_cols=("kind",),
            agg_exprs={
                "id": F.lit(-1).cast("long"),
                "cents": F.sum("cents").cast("long"),
                "cnt": F.sum("cnt").cast("long"),
            },
            sort_keys=("kind",),
        )
        assert stats["partitions_rolled"] == 3
        assert stats["rows_before"] == 30 and stats["rows_after"] == 6
        out = spark.read.parquet(path)
        # nothing lost: totals survive the downsample
        assert out.agg(F.sum("cnt")).first()[0] == 40
        assert out.agg(F.sum("cents")).first()[0] == 400
        # aged rows carry the pinned identity default
        assert (
            out.filter(F.col("ym") < 4).agg(F.max("id")).first()[0] == -1
        )
        mtimes_after = {
            f: _os.stat(_os.path.join(live, f)).st_mtime_ns
            for f in _os.listdir(live)
        }
        assert mtimes_after == mtimes_before


class TestMergeEngine:
    def _family(self, spark, tmp_path):
        import os as _os

        base = str(tmp_path)
        spark.createDataFrame(
            [(1, "x", 10)], "id long, kind string, v long"
        ).write.parquet(_os.path.join(base, "m_2024"))
        spark.createDataFrame(
            [(2, "y", 20, "eu")], "id long, kind string, v long, region string"
        ).write.parquet(_os.path.join(base, "m_2025"))
        spark.createDataFrame(
            [(9, "z", 90)], "id long, kind string, v long"
        ).write.parquet(_os.path.join(base, "other"))
        return base

    def test_regex_membership_and_virtual_column(self, spark, tmp_path):
        from go_nats_to_clickhouse_spark.plans.layout import merge_engine

        base = self._family(spark, tmp_path)
        m = merge_engine(spark, base, r"^m_")
        rows = {r.id: (r._table, r.region) for r in m.collect()}
        # non-matching table excluded; provenance column filled per member
        assert rows == {1: ("m_2024", None), 2: ("m_2025", "eu")}

    def test_no_match_raises(self, spark, tmp_path):
        import pytest

        from go_nats_to_clickhouse_spark.plans.layout import merge_engine

        self._family(spark, tmp_path)
        with pytest.raises(ValueError, match="no table"):
            merge_engine(spark, str(tmp_path), r"^absent_")


class TestRowPolicies:
    def _policies(self):
        from go_nats_to_clickhouse_spark.admission import RowPolicy

        return [
            RowPolicy("p1", "t", "kind = 'a'", users=("alice",)),
            RowPolicy("p2", "t", "kind = 'b'", users=("alice",)),
            RowPolicy(
                "r1", "t", "v < 100", users=("alice",), restrictive=True
            ),
        ]

    def _df(self, spark):
        return spark.createDataFrame(
            [("a", 10), ("b", 200), ("c", 10)], "kind string, v long"
        )

    def test_permissive_or_then_restrictive_and(self, spark):
        from go_nats_to_clickhouse_spark.admission import apply_row_policies

        out = apply_row_policies(
            self._df(spark), "t", "alice", self._policies()
        ).collect()
        # (a OR b) AND v<100 -> only ('a', 10); ('b', 200) cut by the
        # restrictive policy, ('c', 10) by the permissive union
        assert [(r.kind, r.v) for r in out] == [("a", 10)]

    def test_uncovered_user_sees_nothing_once_policies_exist(self, spark):
        """ClickHouse's documented footgun, preserved faithfully: any
        permissive policy on the table hides it entirely from users
        granted none."""
        from go_nats_to_clickhouse_spark.admission import apply_row_policies

        out = apply_row_policies(
            self._df(spark), "t", "mallory", self._policies()
        )
        assert out.count() == 0

    def test_policy_free_table_fully_visible(self, spark):
        from go_nats_to_clickhouse_spark.admission import apply_row_policies

        out = apply_row_policies(
            self._df(spark), "other_table", "mallory", self._policies()
        )
        assert out.count() == 3


class TestParagraphDedup:
    def test_kept_equals_distinct_paragraphs(self, spark, sf_dir):
        """Global invariant: total kept paragraphs == the number of
        DISTINCT paragraph texts in the corpus (exact first-occurrence
        dedup keeps exactly one instance of each)."""
        from go_nats_to_clickhouse_spark.queries.util import load_table

        out = QUERIES["dedup_paragraph_exact"](spark, sf_dir)
        kept = out.agg(F.sum("paras_kept")).first()[0]
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        d = docs.withColumn("arr", F.split("text", " ")).withColumn(
            "npar", F.ceil(F.size("arr") / F.lit(10.0)).cast("int")
        )
        paras = F.transform(
            F.sequence(F.lit(0), F.col("npar") - 1),
            lambda g: F.array_join(
                F.slice(F.col("arr"), g * F.lit(10) + 1, F.lit(10)), " "
            ),
        )
        distinct = (
            d.select(F.explode(paras).alias("para"))
            .select("para")
            .distinct()
            .count()
        )
        assert kept == distinct
        total = out.agg(F.sum("paras_total")).first()[0]
        assert kept < total  # the fixture does contain repeated chunks


class TestOptimizeDeduplicate:
    def test_full_row_dedup_within_partitions(self, spark, tmp_path):
        """Byte-identical double deliveries vanish; rows that differ in
        ANY column survive (full-row semantics, not key semantics)."""
        from go_nats_to_clickhouse_spark.plans.layout import (
            optimize_deduplicate,
        )

        path = str(tmp_path / "od")
        base = spark.createDataFrame(
            [(i, i % 3 + 1, i * 10) for i in range(12)],
            "id long, ym int, v long",
        )
        base.write.partitionBy("ym").parquet(path)
        # double-deliver a subset byte-identically...
        base.filter(F.col("id") % 2 == 0).write.mode("append").partitionBy(
            "ym"
        ).parquet(path)
        # ...and append a same-id row with a DIFFERENT value (not a dup)
        spark.createDataFrame(
            [(0, 1, 999)], "id long, ym int, v long"
        ).write.mode("append").partitionBy("ym").parquet(path)
        stats = optimize_deduplicate(spark, path, sort_keys=("id",))
        assert stats["rows_before"] == 19
        assert stats["rows_after"] == 13
        out = spark.read.parquet(path)
        assert out.count() == 13
        assert out.filter(F.col("id") == 0).count() == 2  # both distinct rows

    def test_driver_row_equals_raw_totals(self, spark, sf_dir):
        """events_dupes read PLAIN equals raw events totals — the
        double-delivered 20% is physically gone."""
        from go_nats_to_clickhouse_spark.queries.util import load_table

        got = {
            r.event_type: (r.n, r.total_cents)
            for r in QUERIES["table_optimize_dedup"](spark, sf_dir).collect()
        }
        want = {
            r.event_type: (r.n, r.total_cents)
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .collect()
        }
        assert got == want


class TestRangeHashedDict:
    def test_broadcast_hash_join_with_range_residual(self, spark, sf_dir):
        """The dictionary lookup must compile to a BroadcastHashJoin on
        the hash key with the validity range as a residual — never a
        nested-loop or a shuffle join."""
        df = QUERIES["join_dict_range_hashed"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_default_branch_and_range_switch(self, spark, sf_dir):
        """'signup' (absent from the dictionary) charges rate 0; every
        covered type's rate_sum is consistent with its two-range tariff
        (rate_sum == n_first_half*r1 + n_second_half*r2)."""
        from go_nats_to_clickhouse_spark.queries.clickhouse_r8 import (
            _TARIFF_ROWS,
        )
        from go_nats_to_clickhouse_spark.queries.util import load_table

        got = {
            r.event_type: (r.n, r.rate_sum)
            for r in QUERIES["join_dict_range_hashed"](spark, sf_dir).collect()
        }
        assert got["signup"][1] == 0
        day = F.date_format("ts", "yyyyMMdd").cast("long")
        halves = {
            (r.event_type, r.early): r.n
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type", (day <= 20240115).alias("early"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        rates = {
            (t, f == 20240101): r for t, f, _to, r in _TARIFF_ROWS
        }
        for etype in ("click", "error", "purchase", "view"):
            want = sum(
                halves.get((etype, early), 0) * rates[(etype, early)]
                for early in (True, False)
            )
            assert got[etype][1] == want


class TestArrayJoinSemantics:
    def test_left_keeps_empty_array_docs(self, spark, sf_dir):
        """LEFT ARRAY JOIN retention: docs_total (distinct docs under
        explode_outer) equals the full corpus; inner rows < left rows
        exactly when empty-array docs exist."""
        from go_nats_to_clickhouse_spark.queries.util import load_table

        out = QUERIES["join_array_left"](spark, sf_dir)
        tot = out.agg(
            F.sum("docs_total"), F.sum("arr_rows"), F.sum("left_rows")
        ).first()
        n_docs = load_table(spark, sf_dir, "documents").count()
        assert tot[0] == n_docs
        assert tot[2] - tot[1] > 0  # the fixture has empty-array docs


class TestEraseWhere:
    def test_nested_layout_probe_and_rewrite(self, spark, tmp_path):
        """erase_where on a stream=*/ym=* nested layout: only leaves
        with matches rewrite (others byte-identical), the predicate may
        reference partition columns, and surviving rows are intact."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import erase_where

        path = str(tmp_path / "nested")
        df = spark.createDataFrame(
            [
                (i, "s1" if i % 2 == 0 else "s2", 202401 + (i % 2), f"u{i % 5}")
                for i in range(20)
            ],
            "id long, stream string, ym int, who string",
        )
        df.write.partitionBy("stream", "ym").parquet(path)
        untouched = _os.path.join(path, "stream=s2", "ym=202402")
        mt_before = {
            f: _os.stat(_os.path.join(untouched, f)).st_mtime_ns
            for f in _os.listdir(untouched)
        }
        stats = erase_where(
            spark,
            path,
            (F.col("who") == "u0") & (F.col("stream") == "s1"),
            sort_keys=("id",),
        )
        assert stats["rows_erased"] == 2  # u0 = ids 0,5,10,15; s1 keeps 0,10
        assert stats["partitions_rewritten"] == 1  # s1 holds only ym=202401
        out = spark.read.parquet(path)
        assert out.count() == 18
        assert (
            out.filter(
                (F.col("who") == "u0") & (F.col("stream") == "s1")
            ).count()
            == 0
        )
        # s2 keeps its u0 rows (the predicate scoped to s1)
        assert out.filter(F.col("who") == "u0").count() > 0
        mt_after = {
            f: _os.stat(_os.path.join(untouched, f)).st_mtime_ns
            for f in _os.listdir(untouched)
        }
        assert mt_after == mt_before


class TestCascadeErased:
    def test_no_erased_entity_in_any_cascade_table(self, spark, sf_dir):
        """After the cascade erase, no raw, union, or analytics row
        references an erase-set entity — documents AND their embedding
        twins."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.materialize import (
            ERASE_MOD,
            cascade_erased_tables,
        )
        from go_nats_to_clickhouse_spark.streaming.pipeline import (
            ALL_STREAMS_TABLE,
            ANALYTICS_TABLE,
            RAW_TABLE_PREFIX,
        )

        t = cascade_erased_tables(spark, sf_dir)
        wh = t["warehouse"]
        rid = F.regexp_extract(F.col("chat_id"), r"([0-9]+)$", 1)
        for table in (RAW_TABLE_PREFIX.rstrip("_"), ALL_STREAMS_TABLE):
            df = spark.read.parquet(_os.path.join(wh, table))
            assert (
                df.filter(
                    (rid != "")
                    & (F.pmod(rid.cast("long"), F.lit(ERASE_MOD)) == 0)
                ).count()
                == 0
            ), table
            assert df.count() > 0, table
        ana = spark.read.parquet(_os.path.join(wh, ANALYTICS_TABLE))
        assert (
            ana.filter(
                F.pmod(F.col("message_id").cast("long"), F.lit(ERASE_MOD)) == 0
            ).count()
            == 0
        )
        # both payload kinds survived for non-erased entities
        assert ana.filter(F.col("project_code") == "embeddings").count() > 0

    def test_raw_union_analytics_agree_after_erase(self, spark, sf_dir):
        """One logical erasure, three physical tables: the per-stream
        raw table, the union table, and the analytics table must hold
        the SAME surviving entity set."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.materialize import (
            cascade_erased_tables,
        )
        from go_nats_to_clickhouse_spark.streaming.pipeline import (
            ALL_STREAMS_TABLE,
            ANALYTICS_TABLE,
            RAW_TABLE_PREFIX,
        )

        t = cascade_erased_tables(spark, sf_dir)
        wh = t["warehouse"]

        def chat_ids(table):
            return {
                r.chat_id
                for r in spark.read.parquet(_os.path.join(wh, table))
                .select("chat_id")
                .distinct()
                .collect()
            }

        raw_ids = chat_ids(RAW_TABLE_PREFIX.rstrip("_"))
        union_ids = chat_ids(ALL_STREAMS_TABLE)
        ana = spark.read.parquet(_os.path.join(wh, ANALYTICS_TABLE))
        ana_ids = {
            ("doc-" if r.project_code != "embeddings" else "vec-")
            + r.message_id
            for r in ana.select("project_code", "message_id")
            .distinct()
            .collect()
        }
        assert raw_ids == union_ids == ana_ids
        assert len(raw_ids) > 0

    def test_health_row_records_the_erase(self, spark, sf_dir):
        import os as _os

        from go_nats_to_clickhouse_spark.plans.materialize import (
            cascade_erased_tables,
            ingested_index_tables,
        )
        from go_nats_to_clickhouse_spark.streaming.pipeline import (
            ANALYTICS_TABLE,
            HEALTH_TABLE,
        )

        t = cascade_erased_tables(spark, sf_dir)
        g = ingested_index_tables(spark, sf_dir)
        h = spark.read.parquet(_os.path.join(t["warehouse"], HEALTH_TABLE))
        row = h.filter(F.col("family") == "erase_cascade").collect()
        assert len(row) == 1
        # conservation across all three tables: raw + union + analytics
        # each lost the same entity rows; health records their sum
        before = spark.read.parquet(
            _os.path.join(g["warehouse"], ANALYTICS_TABLE)
        ).count()
        after = spark.read.parquet(
            _os.path.join(t["warehouse"], ANALYTICS_TABLE)
        ).count()
        n_ana = before - after
        assert n_ana > 0
        assert row[0].rows_in == 3 * n_ana


class TestLeakageSafeSplit:
    def test_clusters_never_straddle_and_split_covers_corpus(
        self, spark, sf_dir
    ):
        """Every near-dup pair lands inside one split (the leakage
        guarantee), the three splits partition the whole corpus
        generation, and assignment is deterministic across runs."""
        from go_nats_to_clickhouse_spark.plans.materialize import NEW_SOURCES
        from go_nats_to_clickhouse_spark.queries.util import load_table

        out = QUERIES["pipeline_leakage_safe_split"](spark, sf_dir).collect()
        rows = {r.split: (r.n_docs, r.n_chars, r.n_cross_pairs) for r in out}
        assert set(rows) == {"train", "val", "test"}
        assert all(v[2] == 0 for v in rows.values())
        corpus_n = (
            load_table(spark, sf_dir, "documents")
            .filter(~F.col("source").isin(*NEW_SOURCES))
            .count()
        )
        assert sum(v[0] for v in rows.values()) == corpus_n
        # train dominates under the 80/10/10 root-hash buckets
        assert rows["train"][0] > rows["val"][0]
        assert rows["train"][0] > rows["test"][0]
        again = {
            r.split: (r.n_docs, r.n_chars, r.n_cross_pairs)
            for r in QUERIES["pipeline_leakage_safe_split"](
                spark, sf_dir
            ).collect()
        }
        assert again == rows


class TestStreamingCollapsingMv:
    def test_streamed_equals_batch_built_collapsing(self, spark, sf_dir):
        """Twin pin (the weighted-median-twins discipline): the state
        maintained INCREMENTALLY by the streaming MV writer — version-
        resolved cancels across real micro-batches in arbitrary arrival
        order — equals the batch-built events_collapsing table row for
        row. Same truth, two maintenance paths, one shared oracle."""
        streamed = {
            (r.user_id, r.value_cents, r.live)
            for r in QUERIES["streaming_collapsing_mv"](
                spark, sf_dir
            ).collect()
        }
        batch = {
            (r.user_id, r.value_cents, r.live)
            for r in QUERIES["table_collapsing_read"](spark, sf_dir).collect()
        }
        assert streamed == batch
        assert len(streamed) > 0


class TestMaterializeColumn:
    def test_default_read_then_materialize(self, spark, tmp_path):
        """ADD COLUMN DEFAULT lifecycle: old partitions compute at read,
        new partitions store; MATERIALIZE rewrites ONLY the column-less
        partitions (stored ones byte-identical) and afterwards a plain
        read equals the default read."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import (
            materialize_column,
            read_with_default,
        )

        path = str(tmp_path / "ac")
        old = spark.createDataFrame(
            [(i, 1, i * 100) for i in range(10)], "id long, ym int, v long"
        )
        old.write.partitionBy("ym").parquet(path)
        new = spark.createDataFrame(
            [(i, 2, i * 100, i) for i in range(10, 20)],
            "id long, ym int, v long, bucket long",
        )
        new.write.mode("append").partitionBy("ym").parquet(path)
        default = F.floor(F.col("v") / F.lit(100)).cast("long")
        viewed = read_with_default(spark, path, "bucket", default)
        got = {r.id: r.bucket for r in viewed.collect()}
        assert got == {i: i for i in range(20)}
        stored_dir = _os.path.join(path, "ym=2")
        mt_before = {
            f: _os.stat(_os.path.join(stored_dir, f)).st_mtime_ns
            for f in _os.listdir(stored_dir)
        }
        stats = materialize_column(
            spark, path, "bucket", default, sort_keys=("id",)
        )
        assert stats == {"partitions_materialized": 1, "rows_written": 10}
        mt_after = {
            f: _os.stat(_os.path.join(stored_dir, f)).st_mtime_ns
            for f in _os.listdir(stored_dir)
        }
        assert mt_after == mt_before
        plain = {r.id: r.bucket for r in spark.read.parquet(path).collect()}
        assert plain == got

    def test_column_absent_everywhere_is_synthesized(self, spark, tmp_path):
        from go_nats_to_clickhouse_spark.plans.layout import read_with_default

        path = str(tmp_path / "ac2")
        spark.createDataFrame(
            [(1, 1, 500)], "id long, ym int, v long"
        ).write.partitionBy("ym").parquet(path)
        out = read_with_default(
            spark, path, "bucket", F.floor(F.col("v") / F.lit(100))
        ).collect()
        assert out[0].bucket == 5


class TestCascadeErasedLive:
    def test_no_erased_entity_and_phase_b_arrived(self, spark, sf_dir):
        """Live variant: zero erase-set entities in any cascade table,
        AND the post-erase phase-B docs (odd non-erase ids) are present
        — the appends landed on the scrubbed tables."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.materialize import (
            ERASE_MOD,
            cascade_erased_live_tables,
        )
        from go_nats_to_clickhouse_spark.streaming.pipeline import (
            ALL_STREAMS_TABLE,
            ANALYTICS_TABLE,
            HEALTH_TABLE,
            RAW_TABLE_PREFIX,
        )

        t = cascade_erased_live_tables(spark, sf_dir)
        wh = t["warehouse"]
        rid = F.regexp_extract(F.col("chat_id"), r"([0-9]+)$", 1)
        for table in (RAW_TABLE_PREFIX.rstrip("_"), ALL_STREAMS_TABLE):
            df = spark.read.parquet(_os.path.join(wh, table))
            assert (
                df.filter(
                    (rid != "")
                    & (F.pmod(rid.cast("long"), F.lit(ERASE_MOD)) == 0)
                ).count()
                == 0
            ), table
        ana = spark.read.parquet(_os.path.join(wh, ANALYTICS_TABLE))
        mid = F.col("message_id").cast("long")
        assert ana.filter(F.pmod(mid, F.lit(ERASE_MOD)) == 0).count() == 0
        assert (
            ana.filter(
                (F.pmod(mid, F.lit(2)) == 1)
                & (F.pmod(mid, F.lit(ERASE_MOD)) != 0)
            ).count()
            > 0
        )
        h = spark.read.parquet(_os.path.join(wh, HEALTH_TABLE))
        assert h.filter(F.col("family") == "erase_cascade").count() == 1

    def test_live_equals_stop_then_erase_truth(self, spark, sf_dir):
        """Both cascade-erase flavors serve the same never-ingested
        answer: the live row equals the stop-then-erase row per source
        (the whole point of mutations-concurrent-with-inserts)."""
        live = {
            (r.source, r.n_msgs, r.n_chars_stored, r.erased_present)
            for r in QUERIES["pipeline_cascade_erased_live"](
                spark, sf_dir
            ).collect()
        }
        stopped = {
            (r.source, r.n_msgs, r.n_chars_stored, r.erased_present)
            for r in QUERIES["pipeline_cascade_erased"](
                spark, sf_dir
            ).collect()
        }
        assert live == stopped
        assert len(live) > 0


class TestPartsReport:
    def test_footer_stats_match_data(self, spark, tmp_path):
        """parts_report reads ONLY footers; its counts and min/max must
        equal the data — including after an append creates a second
        part file in one partition (n_files visible, stats merged)."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import parts_report

        path = str(tmp_path / "pr")
        spark.createDataFrame(
            [(i, i % 2 + 1) for i in range(20)], "id long, ym int"
        ).coalesce(1).write.partitionBy("ym").parquet(path)
        spark.createDataFrame(
            [(100, 1)], "id long, ym int"
        ).coalesce(1).write.mode("append").partitionBy("ym").parquet(path)
        rep = {
            r.part: (r.n_files, r.n_rows, r.min_id, r.max_id)
            for r in parts_report(spark, path, "id").collect()
        }
        assert rep[1] == (2, 11, 0, 100)
        assert rep[2] == (1, 10, 1, 19)
        # and the report never opened a data page: nothing to assert
        # directly, but the whole structure is derived via pyarrow
        # metadata objects only (see implementation)
        assert set(rep) == {
            int(d.split("=")[1])
            for d in _os.listdir(path)
            if d.startswith("ym=")
        }


class TestLeakageSplitErased:
    def test_erased_docs_absent_and_invariant_holds(self, spark, sf_dir):
        """Split x erase composition: erased docs appear in no split,
        totals cover exactly the surviving corpus, zero cross-split
        pairs on the repaired graph."""
        from go_nats_to_clickhouse_spark.plans.materialize import (
            ERASE_MOD,
            NEW_SOURCES,
        )
        from go_nats_to_clickhouse_spark.queries.util import load_table

        out = QUERIES["pipeline_leakage_safe_split_erased"](
            spark, sf_dir
        ).collect()
        rows = {r.split: (r.n_docs, r.n_cross_pairs) for r in out}
        assert set(rows) == {"train", "val", "test"}
        assert all(v[1] == 0 for v in rows.values())
        surviving = (
            load_table(spark, sf_dir, "documents")
            .filter(
                ~F.col("source").isin(*NEW_SOURCES)
                & (F.pmod(F.col("doc_id"), F.lit(ERASE_MOD)) != 0)
            )
            .count()
        )
        assert sum(v[0] for v in rows.values()) == surviving


class TestLeakageSplitDay3:
    def test_promoted_batch_docs_follow_their_cluster(self, spark, sf_dir):
        """Split x promotion: the domain covers day-1 + folded day-2
        docs exactly, zero cross-split pairs on the full multi-
        generation graph, and any folded batch doc with a cross edge to
        a day-1 doc shares that doc's split (the leak the per-
        generation split would create)."""
        from go_nats_to_clickhouse_spark.plans.materialize import (
            DAY3_SOURCES,
            NEW_SOURCES,
            gen3_tables,
        )
        from go_nats_to_clickhouse_spark.queries.util import load_table

        out = QUERIES["pipeline_leakage_safe_split_day3"](
            spark, sf_dir
        ).collect()
        rows = {r.split: (r.n_docs, r.n_cross_pairs) for r in out}
        assert all(v[1] == 0 for v in rows.values())
        docs = load_table(spark, sf_dir, "documents")
        n_domain = docs.filter(~F.col("source").isin(*DAY3_SOURCES)).count()
        assert sum(v[0] for v in rows.values()) == n_domain
        # cross edges exist in the fixture (else the composition claim
        # is vacuous): at least one folded batch doc is chained to a
        # day-1 doc through the promoted graph
        t = gen3_tables(spark, sf_dir)
        pairs = spark.read.parquet(t["corpus_pairs"])
        new_ids = {
            r.doc_id
            for r in docs.filter(F.col("source").isin(*NEW_SOURCES))
            .select("doc_id")
            .collect()
        }
        cross = pairs.filter(~F.col("within")).collect()
        assert len(cross) > 0
        assert any(r.doc_b in new_ids for r in cross)


class TestClusterProfile:
    def test_profile_accounts_for_every_corpus_doc(self, spark, sf_dir):
        """The histogram partitions the corpus exactly: sum(n_docs) ==
        corpus size, sum over clusters of size*count == sum n_docs, and
        multi-doc clusters exist in the fixture (non-vacuous)."""
        from go_nats_to_clickhouse_spark.plans.materialize import NEW_SOURCES
        from go_nats_to_clickhouse_spark.queries.util import load_table

        out = QUERIES["dedup_cluster_profile"](spark, sf_dir).collect()
        n_corpus = (
            load_table(spark, sf_dir, "documents")
            .filter(~F.col("source").isin(*NEW_SOURCES))
            .count()
        )
        assert sum(r.n_docs for r in out) == n_corpus
        for r in out:
            assert r.n_docs == r.cluster_size * r.n_clusters
        assert any(r.cluster_size >= 2 for r in out)
        assert any(r.cluster_size == 1 for r in out)


class TestFreezeRestore:
    def test_snapshot_survives_mutation_and_restores(self, spark, tmp_path):
        """ALTER TABLE FREEZE: the hardlink snapshot costs zero copied
        bytes (st_nlink == 2), is untouched by a subsequent mutation
        (rename-swap mutations leave old inodes alive under the
        snapshot), and restore_table brings back the pre-mutation state
        exactly."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import (
            freeze_table,
            restore_table,
            update_mutation,
        )

        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(i, i % 2 + 1, 100) for i in range(20)],
            "id long, ym int, cents long",
        ).write.partitionBy("ym").parquet(path)
        before = sorted(
            (r.id, r.ym, r.cents)
            for r in spark.read.parquet(path).collect()
        )
        backup = str(tmp_path / "shadow")
        stats = freeze_table(path, backup)
        assert stats["files_linked"] > 0
        # zero-copy: every snapshot file shares its inode with the live one
        for dirpath, dirnames, files in _os.walk(backup):
            for f in files:
                assert _os.stat(_os.path.join(dirpath, f)).st_nlink == 2
        update_mutation(
            spark,
            path,
            {"cents": F.col("cents") + 900},
            F.col("ym") == 1,
            sort_keys=("id",),
        )
        assert (
            spark.read.parquet(path).agg(F.max("cents")).first()[0] == 1000
        )
        snap = sorted(
            (r.id, r.ym, r.cents)
            for r in spark.read.parquet(backup).collect()
        )
        assert snap == before  # the snapshot never moved
        restore_table(backup, path)
        restored = sorted(
            (r.id, r.ym, r.cents)
            for r in spark.read.parquet(path).collect()
        )
        assert restored == before

    def test_freeze_skips_detached_parts_and_restore_preserves_them(
        self, spark, tmp_path
    ):
        """ADVICE r8: FREEZE snapshots ACTIVE parts only — a table with
        a ``_detached/`` sidecar must not hardlink it into the shadow
        (restore would resurrect the detached partition), and a restore
        over a live table must carry the live ``_detached/`` through
        the swap instead of destroying it."""
        import os as _os

        from go_nats_to_clickhouse_spark.plans.layout import (
            detach_partition,
            freeze_table,
            restore_table,
        )

        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(i, i % 2 + 1, 100) for i in range(20)],
            "id long, ym int, cents long",
        ).write.partitionBy("ym").parquet(path)
        detach_partition(path, "ym", 2)
        backup = str(tmp_path / "shadow")
        freeze_table(path, backup)
        # the snapshot holds only the active partition, no _detached
        assert not _os.path.exists(_os.path.join(backup, "_detached"))
        assert spark.read.parquet(backup).count() == 10
        restore_table(backup, path)
        # live _detached survived the restore swap, still invisible
        assert _os.path.exists(
            _os.path.join(path, "_detached", "ym=2")
        )
        assert spark.read.parquet(path).count() == 10


class TestSamplingWeights:
    def test_effective_mass_bounds_and_cluster_consistency(
        self, spark, sf_dir
    ):
        """1/size weights: effective mass is strictly below raw count
        (the fixture HAS near-dups), at least the number of clusters
        (each cluster contributes ~1e6 ppm), and each singleton
        contributes exactly 1e6."""
        out = QUERIES["pipeline_sampling_weights"](spark, sf_dir).collect()
        n_docs = sum(r.n_docs for r in out)
        eff = sum(r.eff_docs_ppm for r in out)
        assert eff < n_docs * 1_000_000
        prof = QUERIES["dedup_cluster_profile"](spark, sf_dir).collect()
        n_clusters = sum(r.n_clusters for r in prof)
        # floor division loses < 1 ppm-doc per member; lower bound by
        # clusters minus that slack
        assert eff >= n_clusters * 1_000_000 - n_docs
        assert sum(r.n_docs for r in prof) == n_docs


class TestWithTotals:
    def test_totals_computed_before_having(self, spark, sf_dir):
        """The default totals_mode=before_having pin: the TOTALS row
        covers ALL input rows, so when HAVING drops small (type, day)
        groups the totals strictly exceed the surviving groups' sum."""
        from go_nats_to_clickhouse_spark.queries.util import load_table

        out = QUERIES["agg_with_totals"](spark, sf_dir).collect()
        totals = [r for r in out if r.event_type == "TOTALS"]
        groups = [r for r in out if r.event_type != "TOTALS"]
        assert len(totals) == 1
        full = load_table(spark, sf_dir, "events").count()
        assert totals[0].n == full
        assert sum(r.n for r in groups) < full  # >= 1 group was dropped
