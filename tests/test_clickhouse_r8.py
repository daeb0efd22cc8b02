"""Round-8 query additions."""

from __future__ import annotations

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
