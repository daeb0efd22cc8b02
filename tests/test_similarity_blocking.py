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


# ---------------------------------------------------------------------------
# Batch-local partial top-k (VERDICT r6 #2): the kernel-side pruning that
# keeps the global shortlist window from single-reducer-sorting a query's
# full candidate set.
# ---------------------------------------------------------------------------


class TestLocalTopK:
    def test_exact_prefix_of_total_order(self):
        """_local_topk must keep exactly the per-query prefix of the
        (keys..., qid) total order — brute-force checked on a seeded
        random batch including score ties (the neighbor_id tiebreak
        case)."""
        import numpy as np

        from go_nats_to_clickhouse_spark.operators.similarity import _local_topk

        rng = np.random.RandomState(7)
        n = 500
        qid = rng.randint(0, 5, n).astype("int64")
        nid = rng.permutation(n).astype("int64")
        score = rng.randint(0, 20, n).astype("float64")  # many exact ties
        sel = _local_topk(qid, (nid, score), 7)
        got = sorted(zip(qid[sel], score[sel], nid[sel]))
        want = []
        for q in np.unique(qid):
            rows = sorted(
                (score[i], nid[i]) for i in range(n) if qid[i] == q
            )[:7]
            want += [(q, s, v) for s, v in rows]
        assert got == sorted(want)

    def test_empty_batch(self):
        import numpy as np

        from go_nats_to_clickhouse_spark.operators.similarity import _local_topk

        e = np.empty(0, dtype="int64")
        assert len(_local_topk(e, (e, e.astype("float64")), 5)) == 0

    def test_pruned_equals_unpruned_end_to_end(self, spark, monkeypatch):
        """Batch-local pruning must be result-invariant: pq_topk and
        ivfpq_read_topk return bit-identical rows with _local_topk
        disabled (keep-everything) — the prefix-of-total-order argument,
        verified."""
        import numpy as np

        from go_nats_to_clickhouse_spark.operators import similarity

        rows = [
            (
                i,
                [
                    math.sin(0.13 * i + 0.41 * d) + (1.0 if d == i % 16 else 0.0)
                    for d in range(16)
                ],
            )
            for i in range(240)
        ]
        corpus = spark.createDataFrame(
            rows, "neighbor_id long, cv array<double>"
        ).repartition(5)
        queries = spark.createDataFrame(
            [(r[0], r[1]) for r in rows[:6]], "query_id long, qv array<double>"
        )

        def run_both():
            pq = similarity.pq_topk(queries, corpus, m=4, k_sub=8, k=5)
            assigned, centers = similarity.ivf_build_assignments(
                corpus, n_lists=4
            )
            books = similarity.pq_train_codebooks(corpus, m=4, k_sub=8)
            indexed = similarity.ivfpq_index_rows(corpus, centers, books).drop(
                "sq_dist"
            )
            ivfpq = similarity.ivfpq_read_topk(
                queries, indexed, centers, books, nprobe=2, shortlist=20, k=5
            )
            key = lambda r: (r.query_id, r.rank)
            return (
                sorted(((r.query_id, r.rank, r.neighbor_id) for r in pq.collect())),
                sorted(((r.query_id, r.rank, r.neighbor_id) for r in ivfpq.collect())),
            )

        pruned = run_both()
        monkeypatch.setattr(
            similarity,
            "_local_topk",
            lambda qid, keys, limit: np.arange(len(qid), dtype=np.intp),
        )
        unpruned = run_both()
        assert pruned == unpruned

    def test_candidate_volume_bounded_per_query_per_batch(self, spark):
        """The plan pin for the shortlist exchange: the ADC candidate
        feed carries at most ``shortlist`` rows per (query, upstream
        partition) — the shuffle into the global window is
        O(n_q x shortlist x n_batches), never the probed corpus."""
        from go_nats_to_clickhouse_spark.operators import similarity

        rows = [
            (
                i,
                [
                    math.sin(0.29 * i + 0.07 * d) + (1.0 if d == i % 16 else 0.0)
                    for d in range(16)
                ],
            )
            for i in range(400)
        ]
        corpus = spark.createDataFrame(
            rows, "neighbor_id long, cv array<double>"
        ).repartition(4)
        queries = spark.createDataFrame(
            [(r[0], r[1]) for r in rows[:6]], "query_id long, qv array<double>"
        )
        # single cell: every candidate collides onto one partition — the
        # worst case the pruning exists for
        _, centers = similarity.ivf_build_assignments(corpus, n_lists=1)
        books = similarity.pq_train_codebooks(corpus, m=4, k_sub=8)
        indexed = similarity.ivfpq_index_rows(corpus, centers, books).drop(
            "sq_dist"
        )
        shortlist = 9
        cand = similarity.ivfpq_adc_candidates(
            queries, indexed, centers, books, nprobe=1, shortlist=shortlist
        )
        per_batch = (
            cand.withColumn("pid", F.spark_partition_id())
            .groupBy("pid", "query_id")
            .count()
        )
        assert per_batch.count() > 0
        assert per_batch.agg(F.max("count")).first()[0] <= shortlist
