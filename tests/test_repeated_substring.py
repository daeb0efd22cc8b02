"""Known-answer tests for ``dedup_repeated_substring`` — the exact
substring-level dedup pass (Lee et al. 2021 re-expressed as repeated
15-gram span merging in queries/text.py).

The oracle selfcheck proves Spark == DuckDB on the fixture corpus; these
tests prove BOTH match hand-computed span geometry on corpora built to
exercise the boundary cases: exact span bounds, within-doc-only
repetition excluded, sub-threshold overlaps excluded, and three-way
sharing counted once per document.
"""

from __future__ import annotations


from go_nats_to_clickhouse_spark.queries.registry import QUERIES

N = 15  # gram width pinned by queries/text._RS_N


def _run(spark, tmp_path, docs):
    """Write a documents.parquet beside empty sibling dirs and run the
    registered query against it."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(sf + "/_docs")
    import os
    import shutil

    part = [f for f in os.listdir(sf + "/_docs") if f.endswith(".parquet")][0]
    shutil.move(os.path.join(sf, "_docs", part), os.path.join(sf, "documents.parquet"))
    shutil.rmtree(sf + "/_docs")
    rows = QUERIES["dedup_repeated_substring"](spark, sf).collect()
    return {r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total) for r in rows}


def words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestRepeatedSubstring:
    def test_exact_span_bounds(self, spark, tmp_path):
        # Docs 1 and 2 share exactly words 5..24 of doc 1 (a 20-word run);
        # every 15-gram inside it repeats, nothing else does.
        shared = words("s", 20)
        d1 = f"{words('a', 5)} {shared} {words('b', 30)}"
        d2 = f"{words('c', 11)} {shared} {words('d', 3)}"
        out = _run(spark, tmp_path, [(1, d1), (2, d2)])
        # 20-word shared run => positions p..p+5 marked (6 grams), span =
        # 6 + N - 1 = 20 words. One span per doc.
        assert out[1] == (1, 20, 20)
        assert out[2] == (1, 20, 20)

    def test_within_doc_repetition_excluded(self, spark, tmp_path):
        # The same 20-word run twice INSIDE one doc, absent elsewhere:
        # cross-doc semantics must report nothing.
        rep = words("r", 20)
        d1 = f"{rep} {words('x', 10)} {rep}"
        out = _run(spark, tmp_path, [(1, d1), (2, words("z", 60))])
        assert out == {}

    def test_sub_threshold_overlap_excluded(self, spark, tmp_path):
        # A shared run of N-1 words contains no full 15-gram.
        shared = words("s", N - 1)
        d1 = f"{words('a', 20)} {shared}"
        d2 = f"{shared} {words('b', 20)}"
        out = _run(spark, tmp_path, [(1, d1), (2, d2)])
        assert out == {}

    def test_three_way_share_counts_once_per_doc(self, spark, tmp_path):
        shared = words("s", N)  # exactly one gram
        docs = [(i, f"{words(chr(96 + i), 16)} {shared}") for i in (1, 2, 3)]
        out = _run(spark, tmp_path, docs)
        assert out == {1: (1, N, N), 2: (1, N, N), 3: (1, N, N)}

    def test_two_disjoint_spans_merge_only_adjacent(self, spark, tmp_path):
        # Two shared runs separated by unique filler in both docs must
        # surface as TWO spans, not one merged span.
        s1, s2 = words("p", N), words("q", N)
        d1 = f"{s1} {words('u', 20)} {s2}"
        d2 = f"{s1} {words('v', 20)} {s2}"
        out = _run(spark, tmp_path, [(1, d1), (2, d2)])
        assert out[1] == (2, N, 2 * N)
        assert out[2] == (2, N, 2 * N)


class TestPersistedGramIndex:
    """dedup_repeated_substring_read: the ingest-time index form."""

    def _run_read(self, spark, tmp_path, docs, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
        sf = str(tmp_path)
        import os
        import shutil

        spark.createDataFrame(
            [(i, t, "en", "synth", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(sf + "/_docs")
        part = [f for f in os.listdir(sf + "/_docs") if f.endswith(".parquet")][0]
        shutil.move(
            os.path.join(sf, "_docs", part), os.path.join(sf, "documents.parquet")
        )
        shutil.rmtree(sf + "/_docs")
        rows = QUERIES["dedup_repeated_substring_read"](spark, sf).collect()
        inline = QUERIES["dedup_repeated_substring"](spark, sf).collect()
        return (
            {r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total) for r in rows},
            {r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total) for r in inline},
        )

    def test_read_path_equals_inline(self, spark, tmp_path, monkeypatch):
        shared = words("s", 20)
        docs = [
            (1, f"{words('a', 5)} {shared} {words('b', 30)}"),
            (2, f"{words('c', 11)} {shared} {words('d', 3)}"),
            (3, words("z", 40)),
        ]
        read, inline = self._run_read(spark, tmp_path, docs, monkeypatch)
        assert read == inline
        assert read[1] == (1, 20, 20)

    def test_read_plan_never_scans_text(self, spark, tmp_path, monkeypatch):
        # the deployment contract: the span read path touches ONLY index
        # rows — no documents scan, no gram-string re-shingling
        shared = words("s", N)
        docs = [(1, f"{shared} {words('a', 5)}"), (2, f"{words('b', 5)} {shared}")]
        monkeypatch.setenv("SPARK_GRAFT_MAT_DIR", str(tmp_path / "mat"))
        sf = str(tmp_path)
        import os
        import shutil

        spark.createDataFrame(
            [(i, t, "en", "synth", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(sf + "/_docs")
        part = [f for f in os.listdir(sf + "/_docs") if f.endswith(".parquet")][0]
        shutil.move(
            os.path.join(sf, "_docs", part), os.path.join(sf, "documents.parquet")
        )
        shutil.rmtree(sf + "/_docs")
        df = QUERIES["dedup_repeated_substring_read"](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "documents.parquet" not in plan
        assert "xxhash64" not in plan  # keys come from the index, not recomputed
        assert "gram_postings" in plan and "gram_rep" in plan
