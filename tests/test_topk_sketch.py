"""topk_sketch: exactness at full capacity, heavy-hitter guarantee and
bounded shuffle under truncation (zipf-skewed data)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.sketches import topk_sketch


def _zipf_df(spark, n=20000, seed=3):
    rng = np.random.RandomState(seed)
    vals = rng.zipf(1.3, n) % 1000  # skewed over ~1000 distinct ids
    return spark.createDataFrame([(int(v),) for v in vals], "item_id long")


def test_exact_at_full_capacity(spark):
    df = _zipf_df(spark)
    exact = (
        df.groupBy("item_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("item_id"))
        .limit(10)
        .collect()
    )
    got = topk_sketch(df, "item_id", k=10, capacity=100_000).collect()
    assert [(r.item, r.est_count) for r in got] == [
        (r.item_id, r.c) for r in exact
    ]


def test_heavy_hitters_survive_truncation(spark):
    df = _zipf_df(spark)
    true_top = {
        r.item_id
        for r in df.groupBy("item_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("item_id"))
        .limit(5)
        .collect()
    }
    got = {r.item for r in topk_sketch(df, "item_id", k=20, capacity=64).collect()}
    assert true_top <= got, f"lost heavy hitters: {true_top - got}"


def test_counts_are_lower_bounds(spark):
    df = _zipf_df(spark)
    exact = {
        r.item_id: r.c
        for r in df.groupBy("item_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in topk_sketch(df, "item_id", k=20, capacity=64).collect():
        assert r.est_count <= exact[r.item]


def test_weighted_exact_at_full_capacity(spark):
    from go_nats_to_clickhouse_spark.operators.sketches import topk_weighted_sketch

    rows = [(i % 7, (i % 7) + 1) for i in range(700)]  # item j has weight 100*(j+1)
    df = spark.createDataFrame(rows, "item long, w long")
    got = topk_weighted_sketch(df, "item", "w", k=3, capacity=100).collect()
    assert [(r.item, r.est_weight) for r in got] == [(6, 700), (5, 600), (4, 500)]


def test_weighted_heavy_hitter_survives_truncation(spark):
    from go_nats_to_clickhouse_spark.operators.sketches import topk_weighted_sketch

    # one dominant item (half the total weight mass) + a long tail of
    # distinct singletons; capacity far below distinct count
    rows = [(0, 10_000)] + [(i, 1) for i in range(1, 2001)]
    df = spark.createDataFrame(rows, "item long, w long").repartition(4)
    got = topk_weighted_sketch(df, "item", "w", k=1, capacity=50).collect()
    assert got[0].item == 0
    assert got[0].est_weight <= 10_000  # lower bound contract
