"""Property test for ``dedup_repeated_substring``: the Spark operator
must match an independent pure-Python model of the span semantics on
randomly composed corpora.

Corpora are built from a per-example pool of shared phrases so cross-doc
15-gram overlap actually occurs (uniform random words would collide with
probability ~alphabet^-15, i.e. never); docs that reuse a phrase twice
exercise the within-doc-only exclusion, and adjacent shared phrases
exercise span merging across phrase boundaries. Complements
tests/test_repeated_substring.py's hand-built known-answer geometry and
the DuckDB oracle (which shares the SQL formulation this model does not).
"""

from __future__ import annotations

import os
import shutil

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_nats_to_clickhouse_spark.queries.registry import QUERIES

N = 15  # pinned to queries/text._RS_N


def _model(docs: dict[int, list[str]]) -> dict[int, tuple[int, int, int]]:
    """Independent span semantics: mark every position whose N-gram
    occurs in >= 2 distinct docs, merge consecutive positions, report
    (n_spans, max_span_words, repeated_words_total) per doc."""
    occ: dict[tuple[str, ...], set[int]] = {}
    for d, ws in docs.items():
        for i in range(len(ws) - N + 1):
            occ.setdefault(tuple(ws[i : i + N]), set()).add(d)
    rep = {g for g, ds in occ.items() if len(ds) >= 2}
    out: dict[int, tuple[int, int, int]] = {}
    for d, ws in docs.items():
        pos = [i for i in range(len(ws) - N + 1) if tuple(ws[i : i + N]) in rep]
        if not pos:
            continue
        spans: list[list[int]] = []
        for p in pos:
            if spans and p == spans[-1][1] + 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        lens = [e - s + N for s, e in spans]
        out[d] = (len(spans), max(lens), sum(lens))
    return out


_WORD = st.sampled_from([f"w{i}" for i in range(10)])
_PHRASE = st.lists(_WORD, min_size=5, max_size=22)


@st.composite
def _corpus(draw) -> dict[int, list[str]]:
    pool = draw(st.lists(_PHRASE, min_size=1, max_size=4))
    n_docs = draw(st.integers(1, 5))
    docs: dict[int, list[str]] = {}
    for d in range(1, n_docs + 1):
        segs = draw(
            st.lists(
                st.one_of(
                    st.integers(0, len(pool) - 1),  # a shared phrase
                    st.lists(_WORD, min_size=1, max_size=8),  # filler
                ),
                min_size=1,
                max_size=5,
            )
        )
        ws: list[str] = []
        for s in segs:
            ws.extend(pool[s] if isinstance(s, int) else s)
        docs[d] = ws
    return docs


@given(docs=_corpus())
@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_spark_matches_python_model(spark, tmp_path_factory, docs):
    sf = str(tmp_path_factory.mktemp("substr"))
    spark.createDataFrame(
        [(d, " ".join(ws), "en", "synth", len(" ".join(ws))) for d, ws in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(sf + "/_docs")
    part = [f for f in os.listdir(sf + "/_docs") if f.endswith(".parquet")][0]
    shutil.move(os.path.join(sf, "_docs", part), os.path.join(sf, "documents.parquet"))
    shutil.rmtree(sf + "/_docs")
    got = {
        r.doc_id: (r.n_spans, r.max_span_words, r.repeated_words_total)
        for r in QUERIES["dedup_repeated_substring"](spark, sf).collect()
    }
    assert got == _model(docs)
