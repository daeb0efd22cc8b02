"""Randomized equivalence tests for the round-8 table-maintenance
machinery: CollapsingMergeTree writer+merge, the general-predicate
erase, TTL GROUP BY rollup, and OPTIMIZE DEDUPLICATE — each against a
from-scratch reference on seeded-random inputs, batched into one
DataFrame per case (the repo's property-test idiom: coverage without a
Spark job per example)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _random_updates(seed: int, n_users: int = 40, max_len: int = 8):
    """Per-user update sequences: list of (version, cents); versions
    globally unique and increasing (event-id semantics)."""
    rng = random.Random(seed)
    ver = 0
    out = {}
    for uid in range(n_users):
        seq = []
        for _ in range(rng.randrange(1, max_len)):
            ver += 1
            seq.append((ver, rng.randrange(0, 10_000)))
        out[uid] = seq
    return out


class TestCollapsingProperty:
    def test_writer_merge_read_agree_on_random_histories(
        self, spark, tmp_path
    ):
        """For random state histories: the sign table built per the
        writer contract reads (SUM discipline) to exactly last-update-
        per-user BOTH before and after collapsing_compact, and the
        compacted table is one +1 row per user."""
        from go_nats_to_clickhouse_spark.plans.layout import (
            collapsing_compact,
        )

        seqs = _random_updates(seed=88)
        rows = []
        for uid, seq in seqs.items():
            prev = None
            for version, cents in seq:
                if prev is not None:
                    rows.append((uid, prev[0], prev[1], -1))
                rows.append((uid, version, cents, 1))
                prev = (version, cents)
        path = str(tmp_path / "cl")
        (
            spark.createDataFrame(
                rows,
                "user_id long, version long, value_cents long, sign int",
            )
            .withColumn("ub", F.pmod("user_id", F.lit(4)).cast("int"))
            .write.partitionBy("ub")
            .parquet(path)
        )
        expect = {uid: seq[-1][1] for uid, seq in seqs.items()}

        def read_final():
            return {
                r.user_id: (r.cents, r.live)
                for r in spark.read.parquet(path)
                .groupBy("user_id")
                .agg(
                    F.sum(F.col("value_cents") * F.col("sign")).alias("cents"),
                    F.sum("sign").alias("live"),
                )
                .filter(F.col("live") > 0)
                .collect()
            }

        assert read_final() == {u: (c, 1) for u, c in expect.items()}
        stats = collapsing_compact(spark, path, partition_col="ub")
        assert stats["rows_after"] == len(seqs)
        assert read_final() == {u: (c, 1) for u, c in expect.items()}
        out = spark.read.parquet(path)
        assert out.agg(F.min("sign"), F.max("sign")).first() == (1, 1)


class TestEraseWhereProperty:
    def test_random_predicates_match_plain_filter(self, spark, tmp_path):
        """erase_where over a nested (stream, ym) layout equals a plain
        anti-filter of the same predicate, for random data and a
        predicate mixing a data column with a partition column."""
        from go_nats_to_clickhouse_spark.plans.layout import erase_where

        rng = random.Random(77)
        rows = [
            (
                i,
                f"s{rng.randrange(3)}",
                202401 + rng.randrange(2),
                f"u{rng.randrange(7)}",
                rng.randrange(1000),
            )
            for i in range(300)
        ]
        df = spark.createDataFrame(
            rows, "id long, stream string, ym int, who string, v long"
        )
        path = str(tmp_path / "n")
        df.write.partitionBy("stream", "ym").parquet(path)
        where = (F.col("who").isin("u0", "u3") & (F.col("ym") == 202401)) | (
            F.col("v") >= 900
        )
        expect_keep = sorted(
            (r.id, r.v) for r in df.filter(~where).collect()
        )
        n_expect = df.filter(where).count()
        stats = erase_where(spark, path, where, sort_keys=("id",))
        assert stats["rows_erased"] == n_expect
        got = sorted(
            (r.id, r.v) for r in spark.read.parquet(path).collect()
        )
        assert got == expect_keep


class TestTtlRollupProperty:
    def test_totals_survive_and_aged_rows_collapse(self, spark, tmp_path):
        from go_nats_to_clickhouse_spark.plans.layout import ttl_rollup

        rng = random.Random(55)
        rows = [
            (
                i,
                1 + rng.randrange(5),
                f"k{rng.randrange(4)}",
                rng.randrange(100),
                1,
            )
            for i in range(400)
        ]
        df = spark.createDataFrame(
            rows, "id long, ym int, kind string, cents long, cnt long"
        )
        path = str(tmp_path / "r")
        df.write.partitionBy("ym").parquet(path)
        cut = 4
        ttl_rollup(
            spark,
            path,
            before_part=cut,
            group_cols=("kind",),
            agg_exprs={
                "id": F.lit(-1).cast("long"),
                "cents": F.sum("cents").cast("long"),
                "cnt": F.sum("cnt").cast("long"),
            },
            sort_keys=("kind",),
        )
        out = spark.read.parquet(path)
        # global totals preserved exactly
        assert out.agg(F.sum("cents")).first()[0] == sum(
            r[3] for r in rows
        )
        assert out.agg(F.sum("cnt")).first()[0] == len(rows)
        # aged partitions: one row per present kind; live: raw counts
        per = {
            (r.ym, r.kind): r.n
            for r in out.groupBy("ym", "kind")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        from collections import Counter

        raw = Counter((r[1], r[2]) for r in rows)
        for (ym, kind), n in per.items():
            assert n == (1 if ym < cut else raw[(ym, kind)]), (ym, kind)


class TestOptimizeDedupProperty:
    def test_random_duplicate_multisets_collapse_to_distinct(
        self, spark, tmp_path
    ):
        from go_nats_to_clickhouse_spark.plans.layout import (
            optimize_deduplicate,
        )

        rng = random.Random(33)
        base = [
            (rng.randrange(50), 1 + rng.randrange(3), rng.randrange(5) * 10)
            for _ in range(200)
        ]  # collisions on purpose: intra-table duplicates exist pre-append
        df = spark.createDataFrame(base, "id long, ym int, v long")
        path = str(tmp_path / "d")
        df.write.partitionBy("ym").parquet(path)
        df.sample(0.5, seed=1).write.mode("append").partitionBy(
            "ym"
        ).parquet(path)
        optimize_deduplicate(spark, path, sort_keys=("id",))
        got = sorted(
            (r.id, r.ym, r.v) for r in spark.read.parquet(path).collect()
        )
        expect = sorted({(i, y, v) for i, y, v in base})
        assert got == expect
