"""Property test for the text skip indexes (plans/layout.py): on random
corpora and random needles, the pruned searches must return EXACTLY the
full-scan result — bloom false positives may only cost I/O, and false
negatives must be impossible for any token/needle, including ones absent
from the corpus, shorter than a gram, or spanning token boundaries.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans import layout as L

_WORD = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "zz9", "q", "needle", "du", "dup"]
)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


@st.composite
def _corpus(draw):
    n = draw(st.integers(1, 30))
    rows = []
    for i in range(n):
        month = draw(st.integers(1, 3))
        rows.append((dt.datetime(2024, month, 1 + i % 27), f"c{i}", i, draw(_TEXT)))
    return rows


@given(
    rows=_corpus(),
    token=st.one_of(_WORD, st.just("absent")),
    needle=st.sampled_from(["dup", " du", "a g", "zz", "needle", "xyzzy", "ta d"]),
)
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_pruned_equals_full_scan(spark, tmp_path_factory, rows, token, needle):
    path = str(tmp_path_factory.mktemp("txtidx") / "tbl")
    df = spark.createDataFrame(
        rows, "timestamp timestamp, chat_id string, sequence long, data string"
    )
    L.write_partitioned(df, path, sort_keys=("timestamp",), mode="overwrite")
    L.build_token_bloom(spark, path, "data")
    L.build_ngram_bloom(spark, path, "data")

    full = spark.read.parquet(path)
    tok_got, tok_rep = L.search_token_pruned(spark, path, "data", token)
    tok_want = full.filter(
        F.array_contains(F.split(F.lower("data"), L.TOKEN_SPLIT), token.lower())
    )
    assert tok_rep["stale"] is False
    assert sorted(r.sequence for r in tok_got.collect()) == sorted(
        r.sequence for r in tok_want.collect()
    )

    ng_got, ng_rep = L.search_like_pruned(spark, path, "data", needle)
    ng_want = full.filter(F.lower("data").contains(needle.lower()))
    assert ng_rep["stale"] is False
    assert sorted(r.sequence for r in ng_got.collect()) == sorted(
        r.sequence for r in ng_want.collect()
    )
