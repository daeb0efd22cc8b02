"""Focused equivalence tests for the r12 map-side MinHash path.

The optimization round respelled the dedup family's signature/set
construction from explode + groupBy(doc_id) re-aggregation to per-row
array expressions (operators/dedup.shingle_arrays +
minhash_signatures_arr) and carried signatures through the banding
exchange (lsh_candidate_pairs with_sigs=True). These tests pin that the
respelling is VALUE-identical to the legacy exploded path on arbitrary
documents — the property the oracle hash compare relies on.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# Tiny vocabulary so generated docs actually share shingles (collisions,
# duplicate shingles inside one doc, sub-n-word docs all reachable).
_WORD = st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff"])
_DOC = st.lists(_WORD, min_size=0, max_size=24).map(" ".join)


@given(docs=st.lists(_DOC, min_size=1, max_size=24))
@settings(**SETTINGS)
def test_mapside_signatures_equal_exploded(spark, docs):
    """minhash_signatures_arr(shingle_arrays(df)) must equal the legacy
    minhash_signatures(word_shingles(df)) row-for-row: same doc set (docs
    under n words dropped by both), same 16-component signatures."""
    from go_nats_to_clickhouse_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_arr,
        shingle_arrays,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    old = {
        r.doc_id: list(r.sig)
        for r in minhash_signatures(word_shingles(df), 16).collect()
    }
    new = {
        r.doc_id: list(r.sig)
        for r in minhash_signatures_arr(shingle_arrays(df), 16).collect()
    }
    assert new == old


@given(docs=st.lists(_DOC, min_size=1, max_size=24))
@settings(**SETTINGS)
def test_mapside_set_sizes_equal_exploded_counts(spark, docs):
    """size(sharr) must equal the exploded per-doc distinct-shingle count
    (the `sizes` frames several queries now derive map-side)."""
    from go_nats_to_clickhouse_spark.operators.dedup import (
        shingle_arrays,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    old = {
        r.doc_id: r.n
        for r in word_shingles(df)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    new = {
        r.doc_id: r.n
        for r in shingle_arrays(df)
        .select("doc_id", F.size("sharr").alias("n"))
        .collect()
    }
    assert new == old


@given(docs=st.lists(_DOC, min_size=2, max_size=24))
@settings(**SETTINGS)
def test_with_sigs_candidates_dedupe_to_plain_pairs(spark, docs):
    """lsh_candidate_pairs(with_sigs=True) deduped on (doc_a, doc_b) must
    equal the plain deduped pair set, and the carried signatures must be
    the documents' own (so the estimate computed from carried sigs equals
    the estimate computed via re-joins)."""
    from go_nats_to_clickhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_arr,
        shingle_arrays,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    sig = minhash_signatures_arr(shingle_arrays(df), 16)
    plain = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sig, 4, 4, max_bucket=2).collect()
    }
    carried = lsh_candidate_pairs(sig, 4, 4, max_bucket=2, with_sigs=True).collect()
    assert {(r.doc_a, r.doc_b) for r in carried} == plain
    by_doc = {r.doc_id: list(r.sig) for r in sig.collect()}
    for r in carried:
        assert list(r.sig_a) == by_doc[r.doc_a]
        assert list(r.sig_b) == by_doc[r.doc_b]
