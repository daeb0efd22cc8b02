"""Sketch QUALITY tests — not just determinism: MinHash-LSH must actually
find the near-duplicates, and its Jaccard estimates must be close; LSH-ANN
recall is pinned at its measured value for this corpus.

(sf0.001 documents contain planted near-duplicates with Jaccard >= 0.3 —
the exact shingle-join query is the ground truth.)
"""

from __future__ import annotations

import pytest

from go_nats_to_clickhouse_spark.queries import QUERIES


@pytest.fixture(scope="module")
def ground_truth(spark, sf_dir):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["dedup_ngram_jaccard_pairs"](spark, sf_dir).collect()
    }
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in QUERIES["dedup_minhash_lsh_pairs"](spark, sf_dir).collect()
    }
    return exact, est


class TestMinHashQuality:
    def test_all_true_near_dups_are_captured(self, ground_truth):
        exact, est = ground_truth
        true_pairs = {p for p, j in exact.items() if j >= 0.3}
        assert true_pairs, "fixture corpus should contain planted near-dups"
        missed = true_pairs - set(est)
        assert not missed, f"LSH missed true near-dup pairs: {missed}"

    def test_estimates_close_to_exact(self, ground_truth):
        exact, est = ground_truth
        overlap = set(exact) & set(est)
        assert overlap
        # 16-hash estimator: observed max |error| = 0.10 on this corpus;
        # bound at 3 sigma of the binomial estimator (~0.35) to stay robust.
        worst = max(abs(exact[p] - est[p]) for p in overlap)
        assert worst <= 0.35, f"minhash estimate error too large: {worst}"


class TestLshDegenerateSkew:
    """A duplicate flood (VERDICT r1 item 7): thousands of identical docs
    collapse into one (band, bucket); the all-pairs expansion there would be
    quadratic in flood size. The max_bucket guard must route the flood
    through the linear star expansion while leaving normal buckets exact."""

    def test_identical_doc_flood_emits_linear_star_pairs(self, spark):
        from pyspark.sql import functions as F

        from go_nats_to_clickhouse_spark.operators.dedup import minhash_lsh_pairs

        n = 5000
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit("the same exact document body repeated verbatim many times").alias(
                "text"
            ),
        )
        pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=4, max_bucket=64)
        rows = pairs.collect()
        # star expansion: every doc pairs with the representative (doc 0),
        # once — linear, not n*(n-1)/2
        assert len(rows) == n - 1
        assert all(r["doc_a"] == 0 for r in rows)
        assert all(r["est_jaccard"] == 1.0 for r in rows)

    def test_normal_buckets_unaffected_by_guard(self, spark):
        from pyspark.sql import functions as F

        from go_nats_to_clickhouse_spark.operators.dedup import minhash_lsh_pairs

        docs = spark.range(40).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("unique document body number "),
                F.col("id").cast("string"),
                F.lit(" with distinct tokens "),
                (F.col("id") * 7).cast("string"),
                F.lit(" "),
                (F.col("id") * 13).cast("string"),
            ).alias("text"),
        )
        guarded = minhash_lsh_pairs(docs, max_bucket=64)
        exact = minhash_lsh_pairs(docs, max_bucket=None)
        assert sorted(map(tuple, guarded.collect())) == sorted(
            map(tuple, exact.collect())
        )


class TestAnnLshRecall:
    def test_high_recall_on_clustered_corpus(self, spark):
        """On data with real neighborhood structure (the case LSH exists
        for), same-bucket search must recover the true neighbors.

        The driver's embeddings are uniformly random — LSH's degenerate
        case, where top-5 'neighbors' sit at cos~0.3 and recall is no
        better than random bucketing (measured ~0.08-0.22). So quality is
        asserted on a planted clustered corpus: 20 tight clusters of 10
        points; a point's true top-5 are its cluster-mates, which share
        its hyperplane cell almost surely.
        """
        import numpy as np

        from go_nats_to_clickhouse_spark.operators.similarity import (
            brute_force_topk,
            lsh_topk,
        )

        rng = np.random.RandomState(42)
        centers = rng.randn(20, 64)
        rows = []
        vid = 0
        for c in centers:
            for _ in range(10):
                v = c + 0.05 * rng.randn(64)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        from pyspark.sql import functions as F

        q = df.filter(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        c = df.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
        brute = {}
        for r in brute_force_topk(q, c, k=5).collect():
            brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        lsh = {}
        for r in lsh_topk(q, c, n_planes=4, dim=64, k=5).collect():
            lsh.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [
            len(brute[qid] & lsh.get(qid, set())) / len(brute[qid]) for qid in brute
        ]
        mean_recall = sum(recalls) / len(recalls)
        assert mean_recall >= 0.9, f"clustered recall@5 too low: {mean_recall}"

    def test_lsh_results_are_subset_of_bucketmates_ranked_correctly(
        self, spark, sf_dir
    ):
        # every LSH neighbor must appear in brute-force scoring with the
        # same cosine (determinism across the two pipelines)
        brute_cos = {
            (r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in QUERIES["vector_ann_cosine_topk"](spark, sf_dir).collect()
        }
        for r in QUERIES["vector_ann_lsh_topk"](spark, sf_dir).collect():
            key = (r["query_id"], r["neighbor_id"])
            if key in brute_cos:
                assert abs(brute_cos[key] - r["cosine"]) < 1e-9


class TestIvfRecall:
    def test_high_recall_on_clustered_corpus(self, spark):
        """IVF with nprobe=4 over 16 cells must recover true neighbors on a
        clustered corpus (cluster-mates land in the same k-means cell)."""
        import numpy as np
        from pyspark.sql import functions as F

        from go_nats_to_clickhouse_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        rng = np.random.RandomState(7)
        centers = rng.randn(20, 64)
        rows = []
        vid = 0
        for c in centers:
            for _ in range(10):
                v = c + 0.05 * rng.randn(64)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        q = df.filter(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        c = df.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
        brute = {}
        for r in brute_force_topk(q, c, k=5).collect():
            brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        ivf = {}
        for r in ivf_topk(q, c, n_lists=16, nprobe=4, k=5).collect():
            ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [
            len(brute[qid] & ivf.get(qid, set())) / len(brute[qid]) for qid in brute
        ]
        mean_recall = sum(recalls) / len(recalls)
        assert mean_recall >= 0.9, f"IVF clustered recall@5 too low: {mean_recall}"
