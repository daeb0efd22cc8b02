"""Pins for operators/positional.py (distributed global row index /
PASTE JOIN) and the DDSketch bucket math in queries/clickhouse_r7.py."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestGlobalRowIndex:
    def test_equals_row_number(self, spark):
        from go_nats_to_clickhouse_spark.operators.positional import (
            global_row_index,
        )

        rows = [(v % 7, v) for v in range(500)]  # duplicate sort values
        df = spark.createDataFrame(rows, "grp int, uid int")
        got = {
            r.uid: r.pos
            for r in global_row_index(
                df, ["grp", "uid"], num_partitions=8
            ).collect()
        }
        want = {
            uid: i
            for i, (_, uid) in enumerate(sorted(rows))
        }
        assert got == want

    def test_no_single_reducer(self, spark):
        """The index pass must not collapse to one partition — the whole
        point vs row_number() OVER ()."""
        from go_nats_to_clickhouse_spark.operators.positional import (
            global_row_index,
        )

        df = spark.range(1000).select(F.col("id").alias("v"))
        out = global_row_index(df, ["v"], num_partitions=8)
        assert out.rdd.getNumPartitions() > 1
        assert out.count() == 1000

    def test_empty_input(self, spark):
        from go_nats_to_clickhouse_spark.operators.positional import (
            global_row_index,
        )

        df = spark.range(0).select(F.col("id").alias("v"))
        assert global_row_index(df, ["v"], num_partitions=4).count() == 0

    def test_paste_truncates_to_shorter(self, spark):
        from go_nats_to_clickhouse_spark.operators.positional import paste_join

        left = spark.range(10).select(F.col("id").alias("a"))
        right = spark.range(4).select((F.col("id") * 10).alias("b"))
        got = sorted(
            (r.pos, r.a, r.b)
            for r in paste_join(left, right, ["a"], ["b"]).collect()
        )
        assert got == [(0, 0, 0), (1, 1, 10), (2, 2, 20), (3, 3, 30)]


class TestDDSketchBuckets:
    """The engine-portable bucket function: octave p corrected by integer
    comparisons, 8 sub-buckets per octave, exact singletons below 8."""

    @staticmethod
    def _buckets(spark, values):
        df = spark.createDataFrame([(v,) for v in values], "x long")
        bk = (
            df.selectExpr("x", "CAST(floor(log2(x)) AS BIGINT) AS p0")
            .selectExpr(
                "x",
                "p0 - IF(x < CAST(power(2, p0) AS BIGINT), 1, 0)"
                " + IF(x >= CAST(power(2, p0 + 1) AS BIGINT), 1, 0) AS p",
            )
            .selectExpr(
                "x",
                "CASE WHEN x < 8 THEN x"
                " ELSE p * 8 + (x div CAST(power(2, p - 3) AS BIGINT) - 8)"
                " END AS bucket",
            )
        )
        return {r.x: r.bucket for r in bk.collect()}

    def test_bounds_contain_and_monotone(self, spark):
        # every power-of-two boundary neighborhood + a spread of values
        values = sorted(
            {1, 2, 3, 7, 8, 9, 15, 16, 17}
            | {2**k + d for k in range(3, 40) for d in (-1, 0, 1)}
            | {int(1.37**k) for k in range(5, 90)}
        )
        b = self._buckets(spark, values)
        prev = -1
        for x in values:
            bucket = b[x]
            assert bucket >= prev, f"bucket not monotone at {x}"
            prev = bucket
            if x < 8:
                lo = hi = bucket
            else:
                p, m = divmod(bucket, 8)
                lo = (8 + m) * 2 ** (p - 3)
                hi = (9 + m) * 2 ** (p - 3) - 1
            assert lo <= x <= hi, (x, bucket, lo, hi)
            if lo > 0:
                assert (hi - lo) / lo <= 0.125

    def test_query_contract_columns(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.queries.clickhouse_r7 import (
            agg_ddsketch_quantiles,
        )

        rows = agg_ddsketch_quantiles(spark, sf_dir).collect()
        assert [r.q_label for r in rows] == ["p50", "p90", "p99"]
        for r in rows:
            assert r.within_bucket and r.rel_error_bounded
            assert r.merged_equals_direct
            assert r.est_lo <= r.exact_v <= r.est_hi


class TestPageRank:
    def test_matches_pure_python(self, spark, sf_dir):
        """Integer-exact PageRank: the query must equal a pure-Python
        replay of the same fixed-point arithmetic over the same graph."""
        import pyarrow.parquet as pq_

        from go_nats_to_clickhouse_spark.queries.clickhouse_r7 import (
            _PR_ITERS,
            _PR_SCALE,
            graph_pagerank_topk,
        )

        li = pq_.read_table(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        ).to_pylist()
        pairs = {(r["l_partkey"], r["l_suppkey"]) for r in li}
        edges = [(f"p{p}", f"s{s}") for p, s in pairs]
        edges += [(b, a) for a, b in edges]
        deg = {}
        for a, _ in edges:
            deg[a] = deg.get(a, 0) + 1
        nodes = sorted(deg)
        n = len(nodes)
        base = (15 * _PR_SCALE) // (100 * n)
        r = {v: _PR_SCALE // n for v in nodes}
        for _ in range(_PR_ITERS):
            c = {v: 0 for v in nodes}
            for a, b in edges:
                c[b] += r[a] // deg[a]
            r = {v: base + (85 * c[v]) // 100 for v in nodes}
        want = sorted(((v, rv) for v, rv in r.items()), key=lambda t: (-t[1], t[0]))[
            :20
        ]
        got = [
            (row.node, row.rank_e12)
            for row in graph_pagerank_topk(spark, sf_dir).collect()
        ]
        assert got == want
        # total rank mass stays within the truncation loss of SCALE
        assert sum(rv for _, rv in r.items()) <= _PR_SCALE


class TestPasteJoinGuard:
    def test_overlapping_columns_rejected(self, spark):
        import pytest

        from go_nats_to_clickhouse_spark.operators.positional import paste_join

        left = spark.range(5).selectExpr("id AS a", "id AS shared")
        right = spark.range(5).selectExpr("id AS b", "id AS shared")
        with pytest.raises(ValueError, match="shared"):
            paste_join(left, right, ["a"], ["b"])

    def test_index_col_collision_rejected(self, spark):
        import pytest

        from go_nats_to_clickhouse_spark.operators.positional import paste_join

        left = spark.range(5).selectExpr("id AS pos")
        right = spark.range(5).selectExpr("id AS b")
        with pytest.raises(ValueError, match="pos"):
            paste_join(left, right, ["pos"], ["b"])
