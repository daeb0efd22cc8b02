"""Gram-index erase lifecycle (plans/materialize.erase_grams +
erased_gram_index_tables + the deferred round-12 row
dedup_repeated_substring_erased_read): three independent proofs —

1. surgery == from-scratch: the erased index tables are row-set-equal
   to a FRESH build over the already-filtered corpus (the strongest
   pin; covers the touched-keys-only gram_rep repair including keys
   that must DROP repeated status when their only other witness was
   erased, and keys that must KEEP it);
2. live-DuckDB oracle agreement for the deferred driver row (the same
   canonical compare the driver will run after round-12 activation);
3. deferred-registration governance (not in the live registry yet;
   register() installs exactly the row).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries import text_r11


def words(prefix: str, n: int, start: int = 0) -> str:
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def _write_docs(spark, sf: str, docs):
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(sf + "/_docs")
    part = [f for f in os.listdir(sf + "/_docs") if f.endswith(".parquet")][0]
    shutil.move(
        os.path.join(sf, "_docs", part), os.path.join(sf, "documents.parquet")
    )
    shutil.rmtree(sf + "/_docs")


def test_erase_grams_surgery_equals_fresh_build(spark, tmp_path, monkeypatch):
    """Engineered cases on synthetic docs (GRAM_N-word shared runs):

    * doc 13 (erased: 13 % 13 == 0) shares a run ONLY with doc 1 — after
      erasure that run's keys must LEAVE gram_rep and doc 1's spans must
      vanish (the only-other-witness drop);
    * docs 2, 3, 26 (26 erased) share a run — keys must STAY repeated
      (two surviving witnesses) and docs 2/3 keep their spans;
    * doc 4 shares nothing — untouched.
    Surgery tables must equal a fresh gram_index_tables build over the
    filtered corpus, row-set for row-set."""
    from go_nats_to_clickhouse_spark.operators.dedup import GRAM_N
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    run_a = words("s", GRAM_N + 5)  # shared doc1 <-> doc13 only
    run_b = words("t", GRAM_N + 2)  # shared docs 2, 3, 26
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs = [
        (1, f"{words('a', 4)} {run_a} {words('b', 6)}"),
        (13, f"{words('c', 7)} {run_a}"),
        (2, f"{run_b} {words('d', 5)}"),
        (3, f"{words('e', 3)} {run_b}"),
        (26, f"{run_b} {words('f', 2)}"),
        (4, words("g", 40)),
    ]
    _write_docs(spark, sf, docs)

    erased = M.erased_gram_index_tables(spark, sf)

    # fresh from-scratch build over the filtered corpus in a SECOND mat
    # root (so the grams- cache for sf cannot be reused)
    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    _write_docs(
        spark, sf2, [(i, t) for i, t in docs if i % M.ERASE_MOD != 0]
    )
    fresh = M.gram_index_tables(spark, sf2)

    for t in M.GRAM_TABLES:
        a = spark.read.parquet(erased[t])
        b = spark.read.parquet(fresh[t])
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), t

    # the engineered expectations, read through the span consumer
    got = {
        r.doc_id: r
        for r in text_r11.dedup_repeated_substring_erased_read(
            spark, sf
        ).collect()
    }
    assert 1 not in got  # only-other-witness erased: span gone
    assert 13 not in got and 26 not in got  # erased docs never appear
    assert got[2].max_span_words == GRAM_N + 2
    assert got[3].max_span_words == GRAM_N + 2
    assert 4 not in got


@pytest.mark.parametrize("sf_fixture", ["sf0.001"])
def test_erased_read_matches_never_ingested_oracle(spark, sf_fixture):
    """The driver's canonical compare, run pre-activation against live
    DuckDB at fixture scale (same pattern the r10 deferred rows used)."""
    from tools.selfcheck import _canon, _hash_pdf

    sf_dir = f"/root/testdata/{sf_fixture}"
    spdf = _canon(
        text_r11.dedup_repeated_substring_erased_read(spark, sf_dir).toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    try:
        dpdf = _canon(con.sql(text_r11._oracle_erased()).df())
    finally:
        con.close()
    assert len(spdf) == len(dpdf)
    assert list(spdf.columns) == list(dpdf.columns)
    assert _hash_pdf(spdf) == _hash_pdf(dpdf)


def test_append_grams_equals_fresh_build(spark, tmp_path, monkeypatch):
    """Append lifecycle on engineered witnesses (doc_id % 4 == 3 is the
    held-out appended quarter):

    * doc 3 (appended) shares run_a with BASE doc 1 — the key was
      posted ONCE before the append, so the touched-keys repair must
      flip it repeated and doc 1 gains a RETROACTIVE span;
    * docs 2 and 6 (both base) share run_b — already repeated, must
      survive the append untouched;
    * docs 7 and 11 (both appended) share run_c — repeated status
      created entirely inside the batch.
    The appended tables must equal a fresh build over the full corpus,
    and the span read must match the plain full-corpus expectations."""
    from go_nats_to_clickhouse_spark.operators.dedup import GRAM_N
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    run_a = words("s", GRAM_N + 4)
    run_b = words("t", GRAM_N + 1)
    run_c = words("u", GRAM_N)
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs = [
        (1, f"{words('a', 3)} {run_a}"),  # base
        (2, f"{run_b} {words('b', 5)}"),  # base
        (6, f"{words('c', 2)} {run_b}"),  # base
        (3, f"{run_a} {words('d', 6)}"),  # appended
        (7, f"{words('e', 4)} {run_c}"),  # appended
        (11, f"{run_c} {words('f', 3)}"),  # appended
        (4, words("g", 40)),  # base, shares nothing
    ]
    _write_docs(spark, sf, docs)

    appended = M.appended_gram_index_tables(spark, sf)

    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    _write_docs(spark, sf2, docs)
    fresh = M.gram_index_tables(spark, sf2)

    for t in M.GRAM_TABLES:
        a = spark.read.parquet(appended[t])
        b = spark.read.parquet(fresh[t])
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), t

    got = {
        r.doc_id: r
        for r in text_r11.dedup_repeated_substring_appended_read(
            spark, sf
        ).collect()
    }
    assert got[1].max_span_words == GRAM_N + 4  # retroactive span, base doc
    assert got[3].max_span_words == GRAM_N + 4
    assert got[2].max_span_words == GRAM_N + 1  # pre-existing, untouched
    assert got[6].max_span_words == GRAM_N + 1
    assert got[7].max_span_words == GRAM_N  # batch-internal pair
    assert got[11].max_span_words == GRAM_N
    assert 4 not in got


def test_append_then_erase_composition(spark, tmp_path, monkeypatch):
    """The composed cell: append the held-out quarter, then erase
    doc_id % ERASE_MOD == 0 — the erased-appended tables must equal a
    fresh build over (full corpus \\ erased), with no append-awareness
    in the erase path. doc 13 is BOTH erased and run_a's only other
    witness, so base doc 1's span (created by the append) must vanish
    again after the erase."""
    from go_nats_to_clickhouse_spark.operators.dedup import GRAM_N
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    run_a = words("s", GRAM_N + 3)
    run_b = words("t", GRAM_N)
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs = [
        (1, f"{words('a', 3)} {run_a}"),  # base; witness only via doc 13
        (13, f"{run_a} {words('b', 4)}"),  # appended (13%4==1? no -> base)
        (2, f"{run_b} {words('c', 5)}"),  # base
        (7, f"{words('d', 2)} {run_b}"),  # appended, survives erase
    ]
    # doc 13: 13 % 4 == 1 -> base half; still erased (13 % 13 == 0).
    # The composition cell needs an ERASED APPENDED doc too: doc 39
    # (39 % 4 == 3 appended, 39 % 13 == 0 erased) sharing run_b would
    # make run_b three-witness; keep it simple — add doc 39 sharing
    # run_a so run_a has witnesses {1, 13, 39}, BOTH extra witnesses
    # erased, span on doc 1 must still vanish.
    docs.append((39, f"{words('e', 2)} {run_a}"))
    _write_docs(spark, sf, docs)

    erased_app = M.erased_appended_gram_index_tables(spark, sf)

    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    _write_docs(
        spark, sf2, [(i, t) for i, t in docs if i % M.ERASE_MOD != 0]
    )
    fresh = M.gram_index_tables(spark, sf2)
    for t in M.GRAM_TABLES:
        a = spark.read.parquet(erased_app[t])
        b = spark.read.parquet(fresh[t])
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), t

    got = {
        r.doc_id: r
        for r in text_r11.dedup_repeated_substring_erased_appended_read(
            spark, sf
        ).collect()
    }
    assert 1 not in got  # both other witnesses of run_a were erased
    assert got[2].max_span_words == GRAM_N
    assert got[7].max_span_words == GRAM_N
    assert 13 not in got and 39 not in got


def test_appended_reads_match_oracles_at_fixture_scale(spark):
    """Driver-canonical compare for BOTH new lifecycle rows at sf0.001
    (the erased_read row already has its own oracle test above)."""
    from tools.selfcheck import _canon, _hash_pdf

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = text_r11.r11b_rows()
    try:
        for name in (
            "dedup_repeated_substring_appended_read",
            "dedup_repeated_substring_erased_appended_read",
        ):
            fn, oracle = rows[name]
            spdf = _canon(fn(spark, sf_dir).toPandas())
            dpdf = _canon(con.sql(oracle).df())
            assert len(spdf) == len(dpdf), name
            assert list(spdf.columns) == list(dpdf.columns), name
            assert _hash_pdf(spdf) == _hash_pdf(dpdf), name
    finally:
        con.close()


def test_compact_grams_after_sequential_appends(spark, tmp_path, monkeypatch):
    """Many small appends accumulate postings parts; compact_grams must
    merge them into few globally-gk-sorted files WITHOUT changing any
    row set (read results identical before and after), and a sequence
    of appends must equal the one-shot build (associativity of the
    touched-keys repair)."""
    from go_nats_to_clickhouse_spark.operators.dedup import GRAM_N
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    run = words("s", GRAM_N + 2)
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    base = [(1, f"{words('a', 3)} {run}"), (2, words("b", 30))]
    batches = [
        [(5, f"{run} {words('c', 4)}")],  # second witness for run
        [(9, f"{words('d', 2)} {run}")],  # third
        [(10, words("e", 25))],  # shares nothing
    ]
    _write_docs(spark, sf, base)
    mat_root = str(tmp_path / "idx")
    os.makedirs(mat_root, exist_ok=True)
    # hand-build a root (bypass the cached family: we need to mutate it)
    from go_nats_to_clickhouse_spark.operators.dedup import (
        gram_postings,
        repeated_gram_keys,
    )

    docs_df = spark.createDataFrame(
        [(i, t) for i, t in base], "doc_id long, text string"
    )
    posts = gram_postings(docs_df, n=GRAM_N)
    posts.sortWithinPartitions("gk").write.parquet(
        os.path.join(mat_root, "gram_postings")
    )
    repeated_gram_keys(
        spark.read.parquet(os.path.join(mat_root, "gram_postings"))
    ).write.parquet(os.path.join(mat_root, "gram_rep"))

    for b in batches:
        M.append_grams(
            spark,
            mat_root,
            spark.createDataFrame(
                [(i, t) for i, t in b], "doc_id long, text string"
            ),
        )

    tables = {t: os.path.join(mat_root, t) for t in M.GRAM_TABLES}
    before = {
        r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total)
        for r in text_r11._spans_over(tables, spark).collect()
    }
    assert before[1][1] == GRAM_N + 2  # retroactive span on base doc
    assert set(before) == {1, 5, 9}

    n_files_before = len(
        [f for f in os.listdir(tables["gram_postings"]) if f.endswith(".parquet")]
    )
    M.compact_grams(spark, mat_root, files_target=1)
    n_files_after = len(
        [f for f in os.listdir(tables["gram_postings"]) if f.endswith(".parquet")]
    )
    assert n_files_after == 1 and n_files_before > n_files_after

    after = {
        r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total)
        for r in text_r11._spans_over(tables, spark).collect()
    }
    assert after == before

    # sequence-of-appends == one-shot build over the same doc set
    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    _write_docs(spark, sf2, base + [d for b in batches for d in b])
    fresh = M.gram_index_tables(spark, sf2)
    for t in M.GRAM_TABLES:
        a = spark.read.parquet(tables[t])
        b = spark.read.parquet(fresh[t])
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), t


def test_replayed_append_is_invisible_to_batch_read(
    spark, tmp_path, monkeypatch
):
    """The at-least-once posture belongs to append_grams itself, not
    just the streaming maintainer (ADVICE r11 #2): a crash-retried
    append re-appends identical (gk, doc_id, pos) postings rows, and
    the BATCH read path must absorb them — duplicate positions would
    otherwise split the row_number-based island grouping and inflate
    n_spans on exactly the replayed docs. Since round 12 every gram
    read goes through _spans_over's (doc_id, pos) dedup, so the
    replayed index must read identically to the non-replayed one."""
    from go_nats_to_clickhouse_spark.operators.dedup import (
        GRAM_N,
        gram_postings,
        repeated_gram_keys,
    )
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    run = words("s", GRAM_N + 3)
    base = [(1, f"{words('a', 3)} {run}"), (2, words("b", 30))]
    batch = [(5, f"{run} {words('c', 4)}")]
    mat_root = str(tmp_path / "idx")
    os.makedirs(mat_root, exist_ok=True)
    docs_df = spark.createDataFrame(base, "doc_id long, text string")
    gram_postings(docs_df, n=GRAM_N).sortWithinPartitions(
        "gk"
    ).write.parquet(os.path.join(mat_root, "gram_postings"))
    repeated_gram_keys(
        spark.read.parquet(os.path.join(mat_root, "gram_postings"))
    ).write.parquet(os.path.join(mat_root, "gram_rep"))

    batch_df = spark.createDataFrame(batch, "doc_id long, text string")
    M.append_grams(spark, mat_root, batch_df)
    tables = {t: os.path.join(mat_root, t) for t in M.GRAM_TABLES}
    clean = {
        r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total)
        for r in text_r11._spans_over(tables, spark).collect()
    }
    assert clean[1][1] == GRAM_N + 3 and set(clean) == {1, 5}

    # the crash-retry: the SAME batch appended again (duplicate rows)
    M.append_grams(spark, mat_root, batch_df)
    posts = spark.read.parquet(tables["gram_postings"])
    assert posts.count() > posts.dropDuplicates(
        ["gk", "doc_id", "pos"]
    ).count()  # duplicates really are present at rest
    replayed = {
        r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total)
        for r in text_r11._spans_over(tables, spark).collect()
    }
    assert replayed == clean


def test_crashed_append_healed_by_different_later_batch(
    spark, tmp_path, monkeypatch
):
    """Round-12 convergence upgrade (closing the honesty gap ADVICE r11
    documented): a crash between the postings append and the rep swap
    used to be repaired only by retrying the SAME batch; with the
    _covered.json watermark, ANY later append folds the crashed batch's
    keys into its own repair — ClickHouse's unmerged-parts model. The
    crashed batch here creates a cross-batch repeated gram with a BASE
    doc, so a heal that only recounted the second batch's keys would
    miss it."""
    from go_nats_to_clickhouse_spark.operators.dedup import (
        GRAM_N,
        gram_postings,
        repeated_gram_keys,
    )
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    run_a = words("s", GRAM_N + 2)  # base <-> crashed-batch witness pair
    run_b = words("t", GRAM_N)  # crashed-batch <-> healthy-batch pair
    base = [(1, f"{words('a', 3)} {run_a}"), (2, words("b", 30))]
    crashed = [(5, f"{run_a} {run_b}")]
    healthy = [(9, f"{words('c', 4)} {run_b}")]
    mat_root = str(tmp_path / "idx")
    os.makedirs(mat_root, exist_ok=True)
    docs_df = spark.createDataFrame(base, "doc_id long, text string")
    gram_postings(docs_df, n=GRAM_N).sortWithinPartitions(
        "gk"
    ).write.parquet(os.path.join(mat_root, "gram_postings"))
    _rep_dir = os.path.join(mat_root, "gram_rep")
    repeated_gram_keys(
        spark.read.parquet(os.path.join(mat_root, "gram_postings"))
    ).write.parquet(_rep_dir)
    M._write_gram_covered(
        _rep_dir, M._gram_files(os.path.join(mat_root, "gram_postings"))
    )

    def boom(*a, **k):
        raise RuntimeError("simulated crash before rep swap")

    monkeypatch.setattr(M, "_swap_staged", boom)
    with pytest.raises(RuntimeError):
        M.append_grams(
            spark,
            mat_root,
            spark.createDataFrame(crashed, "doc_id long, text string"),
        )
    monkeypatch.undo()
    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))

    # crashed state: postings landed, rep stale — reads under-report
    tables = {t: os.path.join(mat_root, t) for t in M.GRAM_TABLES}
    partial = {
        r.doc_id for r in text_r11._spans_over(tables, spark).collect()
    }
    assert partial == set()  # no pair was repeated before the crash

    # a DIFFERENT batch appended later must heal the crashed one
    M.append_grams(
        spark,
        mat_root,
        spark.createDataFrame(healthy, "doc_id long, text string"),
    )
    got = {
        r.doc_id: r for r in text_r11._spans_over(tables, spark).collect()
    }
    assert got[1].max_span_words == GRAM_N + 2  # retroactive, CRASHED batch
    # doc 5 carries BOTH runs but as two islands (the grams crossing the
    # run_a|run_b boundary are unique), covering the whole 32-word doc
    assert got[5].n_spans == 2
    assert got[5].max_span_words == GRAM_N + 2
    assert got[5].repeated_words_total == 2 * GRAM_N + 2
    assert got[9].max_span_words == GRAM_N

    # and equals the one-shot build over the same doc set
    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    _write_docs(spark, sf2, base + crashed + healthy)
    fresh = M.gram_index_tables(spark, sf2)
    for t in M.GRAM_TABLES:
        a = spark.read.parquet(tables[t])
        b = spark.read.parquet(fresh[t])
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), t


def test_streamed_family_publishes_no_scaffolding(spark, tmp_path, monkeypatch):
    """The published streamed-gram family must contain ONLY the index
    tables — the _arrivals corpus copy and the _ckpt stream checkpoint
    are build scaffolding and must not ride the publish rename into
    the permanent cache (ADVICE r11 #4: they roughly doubled the
    family's disk footprint with dead data)."""
    from go_nats_to_clickhouse_spark.operators.dedup import GRAM_N
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    run = words("s", GRAM_N)
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    _write_docs(
        spark,
        sf,
        [(1, f"{run} {words('a', 4)}"), (2, f"{words('b', 3)} {run}")],
    )
    tables = M.streamed_gram_index_tables(spark, sf)
    family_dir = os.path.dirname(tables["gram_postings"])
    assert sorted(os.listdir(family_dir)) == sorted(M.GRAM_TABLES)


def test_streamed_gram_index_equals_batch_with_replay(
    spark, tmp_path, monkeypatch
):
    """The streaming maintainer (three real micro-batch epochs + one
    crash-replayed epoch baked in) must serve the same spans as a batch
    build: rep table exactly equal, postings DISTINCT-equal (the replay
    duplicate is the at-least-once contract the consumer dedups), and
    the streamed read row must match the plain full-corpus result."""
    from go_nats_to_clickhouse_spark.operators.dedup import GRAM_N
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    run_a = words("s", GRAM_N + 3)
    run_b = words("t", GRAM_N)
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs = [
        (1, f"{words('a', 3)} {run_a}"),
        (2, f"{run_a} {words('b', 4)}"),
        (3, f"{run_b} {words('c', 5)}"),
        (4, f"{words('d', 2)} {run_b}"),
        (5, words("e", 30)),
    ]
    _write_docs(spark, sf, docs)

    streamed = M.streamed_gram_index_tables(spark, sf)

    sf2 = str(tmp_path / "sf2")
    os.makedirs(sf2)
    _write_docs(spark, sf2, docs)
    fresh = M.gram_index_tables(spark, sf2)

    a_rep = spark.read.parquet(streamed["gram_rep"])
    b_rep = spark.read.parquet(fresh["gram_rep"])
    assert a_rep.exceptAll(b_rep).isEmpty() and b_rep.exceptAll(a_rep).isEmpty()
    a_posts = spark.read.parquet(streamed["gram_postings"])
    b_posts = spark.read.parquet(fresh["gram_postings"])
    # the replayed epoch leaves DUPLICATE rows, not divergent ones
    assert a_posts.distinct().exceptAll(b_posts).isEmpty()
    assert b_posts.exceptAll(a_posts.distinct()).isEmpty()
    assert a_posts.count() > b_posts.count()  # the baked-in replay

    got = {
        r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total)
        for r in text_r11.dedup_repeated_substring_streamed_read(
            spark, sf
        ).collect()
    }
    assert got[1][1] == GRAM_N + 3 and got[2][1] == GRAM_N + 3
    assert got[3][1] == GRAM_N and got[4][1] == GRAM_N
    assert 5 not in got
    assert got[1][0] == 1  # replay duplicates must not split spans


def test_streamed_read_matches_oracle_at_fixture_scale(spark):
    from tools.selfcheck import _canon, _hash_pdf

    sf_dir = "/root/testdata/sf0.001"
    spdf = _canon(
        text_r11.dedup_repeated_substring_streamed_read(spark, sf_dir).toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    try:
        dpdf = _canon(con.sql(text_r11._oracle_full()).df())
    finally:
        con.close()
    assert len(spdf) == len(dpdf)
    assert _hash_pdf(spdf) == _hash_pdf(dpdf)


def test_registration_is_active_and_register_is_exact(monkeypatch):
    """Round 12 flipped the deferred rows live: every gram-lifecycle
    row (incl. the new compacted cell) is in the GLOBAL registry with
    its oracle bound, and register() on a fresh registry produces
    exactly the r11b_rows set — no strays, no misses."""
    from go_nats_to_clickhouse_spark import queries as qpkg
    from go_nats_to_clickhouse_spark.queries import registry

    rows = text_r11.r11b_rows()
    assert "dedup_repeated_substring_compacted_read" in rows
    for name in rows:
        assert name in qpkg.QUERIES
        assert name in qpkg.ORACLES

    fresh_q: dict = {}
    fresh_o: dict = {}
    monkeypatch.setattr(registry, "QUERIES", fresh_q)
    monkeypatch.setattr(registry, "ORACLES", fresh_o)
    text_r11.register()
    assert set(fresh_q) == set(rows)
    assert set(fresh_o) == set(rows)


def test_erased_read_plan_never_scans_text(spark, tmp_path, monkeypatch):
    """The deployment contract carries over to the erased index: the
    span read touches ONLY index rows — no documents scan, no gram
    re-shingling (the erase rewrite happened at maintenance time)."""
    from go_nats_to_clickhouse_spark.operators.dedup import GRAM_N
    from go_nats_to_clickhouse_spark.plans import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
    shared = words("s", GRAM_N)
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    _write_docs(
        spark,
        sf,
        [(1, f"{shared} {words('a', 5)}"), (2, f"{words('b', 5)} {shared}")],
    )
    M.erased_gram_index_tables(spark, sf)  # build outside the plan probe
    df = text_r11.dedup_repeated_substring_erased_read(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan
    assert "xxhash64" not in plan.lower()
