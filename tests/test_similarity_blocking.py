"""Regression pin for operators/similarity.blocked_all_pairs_cosine:
the pair set must be invariant to the block size.

The sf-scale queries happen to fit in one block, which once masked a bug
where off-diagonal block pairs filtered on ``va < vb`` — but id order is
independent of block index order (id x < y can hash to blocks x%n > y%n),
so every such pair was silently dropped. Multi-block runs must return the
exact same (vec_a, vec_b) set as the single-block reference, with no
duplicates from the diagonal blocks.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.similarity import (
    blocked_all_pairs_cosine,
)


@pytest.fixture(scope="module")
def vectors(spark):
    # 60 deterministic 8-dim vectors with plenty of high-cosine pairs.
    rows = [
        (
            i,
            [
                math.sin(0.37 * i + 0.11 * d) + (0.5 if d == i % 8 else 0.0)
                for d in range(8)
            ],
        )
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def _pairs(spark, vectors, rows_per_block):
    df = blocked_all_pairs_cosine(
        spark,
        vectors,
        threshold=0.4,
        n_rows=60,
        rows_per_block=rows_per_block,
    )
    return [(r.vec_a, r.vec_b, round(r.cos, 9)) for r in df.collect()]


def test_multi_block_matches_single_block(spark, vectors):
    reference = sorted(_pairs(spark, vectors, rows_per_block=64))
    assert reference, "fixture must produce at least one qualifying pair"
    assert all(a < b for a, b, _ in reference)
    for rpb in (16, 7):  # 4 and 9 blocks: plenty of off-diagonal pairs
        got = _pairs(spark, vectors, rows_per_block=rpb)
        assert len(got) == len(set((a, b) for a, b, _ in got)), "duplicates"
        assert sorted(got) == reference
