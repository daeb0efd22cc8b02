"""Pins for operators/bloom.py — the deterministic bloom-join reduction."""

from __future__ import annotations

from pyspark.sql import functions as F


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestBloomFilter:
    def test_no_false_negatives_and_bounded_fp(self, spark):
        """Every member passes (Bloom's hard guarantee); non-members pass
        at under ~2% with default geometry at 20k keys."""
        from go_nats_to_clickhouse_spark.operators.bloom import (
            bloom_might_contain,
            build_bloom,
        )

        keys = spark.range(20_000).select(F.col("id").alias("k"))
        bitmap = build_bloom(keys, "k")
        members = keys.filter(
            ~bloom_might_contain(F.col("k"), bitmap)
        ).count()
        assert members == 0, "false negative — bloom contract broken"
        probes = spark.range(20_000, 120_000).select(F.col("id").alias("k"))
        fp = probes.filter(bloom_might_contain(F.col("k"), bitmap)).count()
        assert fp / 100_000 < 0.02, f"fp rate {fp / 100_000:.4f}"

    def test_bitmap_is_deterministic(self, spark):
        from go_nats_to_clickhouse_spark.operators.bloom import build_bloom

        keys = spark.range(500).select(F.col("id").alias("k"))
        a = build_bloom(keys, "k")
        b = build_bloom(keys.repartition(7), "k")
        assert a == b  # partitioning-independent (bit_or is commutative)

    def test_semi_join_equals_plain(self, spark):
        from go_nats_to_clickhouse_spark.operators.bloom import bloom_semi_join

        fact = spark.range(50_000).select((F.col("id") % 997).alias("fk"))
        keys = spark.range(40).select((F.col("id") * 7).alias("dk"))
        got = sorted(
            r.fk for r in bloom_semi_join(fact, keys, "fk", "dk").collect()
        )
        want = sorted(
            r.fk
            for r in fact.join(
                keys.withColumnRenamed("dk", "fk"), "fk", "left_semi"
            ).collect()
        )
        assert got == want and got

    def test_probe_filter_sits_below_exchange(self, spark, sf_dir):
        """The reduction claim, pinned in the plan: the getbit membership
        filter must appear in the fact-scan stage BEFORE any Exchange —
        otherwise the bloom saved nothing."""
        from go_nats_to_clickhouse_spark.queries.clickhouse_r7 import (
            join_bloom_semi_reduction,
        )

        plan = _formatted_plan(join_bloom_semi_reduction(spark, sf_dir))
        assert "getbit" in plan, plan
        # locate the Filter node whose Condition carries the membership
        # test, then assert the TREE shows its direct child is a parquet
        # scan — i.e. the bloom probe runs in the scan stage, below every
        # Exchange.
        import re

        blooms = [
            int(i)
            for i, cond in re.findall(
                r"\((\d+)\) Filter\nInput[^\n]*\nCondition : ([^\n]*)", plan
            )
            if "getbit" in cond
        ]
        assert blooms, plan
        filt_id = blooms[0]
        m = re.search(
            rf"Filter \({filt_id}\)\s*\n[^\n]*Scan parquet\s+\(\d+\)", plan
        )
        assert m, (filt_id, plan)
