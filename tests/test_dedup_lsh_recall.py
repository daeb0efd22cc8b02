"""Recall contract for the LSH-verified pair generator.

``dedup_survivors`` claims its sub-quadratic LSH path produces the SAME
pairs as the exact all-pairs Jaccard join on the fixtures (which is why its
DuckDB oracle can stay exact). That claim is only honest if pinned: with
rows=1 banding the per-pair miss probability at J = 0.5 is ≤ (1-0.5)^16 ≈
1.5e-5 and the hash family is deterministic, so on a fixed fixture the
comparison is exact, not probabilistic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.dedup import (
    lsh_verified_jaccard_pairs,
    word_shingles,
)
from go_nats_to_clickhouse_spark.queries.util import load_table


def _exact_all_pairs(docs, threshold=0.5):
    """The quadratic verifier: exact Jaccard over every doc pair sharing a
    shingle (the shape dedup_survivors used before round 4)."""
    sh = word_shingles(docs, n=3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b")
    )


def test_lsh_pairs_equal_all_pairs_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lsh = {
        (r.doc_a, r.doc_b)
        for r in lsh_verified_jaccard_pairs(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .collect()
    }
    exact = {(r.doc_a, r.doc_b) for r in _exact_all_pairs(docs).collect()}
    missed = exact - lsh
    extra = lsh - exact
    assert not missed, f"LSH candidates missed true pairs: {sorted(missed)[:10]}"
    # exact verification on candidates means precision is 1.0 by construction
    assert not extra, f"verified pairs not in exact set: {sorted(extra)[:10]}"


def test_lsh_pairs_report_exact_jaccard(spark, sf_dir):
    """The jaccard column is the EXACT set Jaccard (not the minhash
    estimate): spot-check one pair against a direct computation."""
    docs = load_table(spark, sf_dir, "documents")
    rows = lsh_verified_jaccard_pairs(docs, threshold=0.5).limit(1).collect()
    if not rows:  # fixture without near-dups — nothing to spot-check
        return
    pair = rows[0]
    sh = word_shingles(docs, n=3)
    sets = {
        r.doc_id: set(r.ss)
        for r in sh.filter(F.col("doc_id").isin(pair.doc_a, pair.doc_b))
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("ss"))
        .collect()
    }
    a, b = sets[pair.doc_a], sets[pair.doc_b]
    expect = len(a & b) / len(a | b)
    assert abs(pair.jaccard - expect) < 1e-12
