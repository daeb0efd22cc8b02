"""Round-11 gram-index lifecycle rows: the exact-substring span read
over the ERASED, the APPENDED, and the APPENDED-then-ERASED
repeated-gram index — completing the build x append x erase lifecycle
matrix for the gram family, which every other index family already had
(shingle/pair graph: promote_batch + erase_docs; ANN cells:
append_ann_batch + erase_vectors; warehouse cascade: streaming inserts
+ erase_where; plans/materialize.{append,erase}_grams add the gram
postings).

ACTIVATED IN ROUND 12: ``register()`` below is called from
queries/__init__ (the round-11 window's 50 slots were fully committed
to the r10-analog activations + the round-5 rotation cohort, so these
rows waited one round under pytest-only oracle verification in
tests/test_gram_erase.py — the same deferral governance clickhouse_r10
used, endorsed by VERDICT r10). Round 12 also adds the fifth cell,
``dedup_repeated_substring_compacted_read`` (VERDICT r11 ask #5),
pinning compact_grams' merge-invisibility contract at the driver gate.
All five names are fronted in ``__spark_entry__._PRIORITY``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.text import _repeated_spans, _RS_N

#: oracle = the inline repeated-substring recomputation over documents
#: that were NEVER INGESTED per the erase rule — the strongest erasure
#: definition (from-scratch equivalence), same wrap pipeline_mat's
#: _kept_cte_erased applies to the shingle-index oracles. ERASE_MOD is
#: interpolated from the materialize module so a rule change cannot
#: leave the oracle silently stale.


def _oracle_erased() -> str:
    from go_nats_to_clickhouse_spark.plans.materialize import ERASE_MOD

    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM (SELECT * FROM documents WHERE doc_id % {ERASE_MOD} <> 0)
),
g AS (
  SELECT doc_id, u.i - 1 AS pos,
         array_to_string(ws[u.i : u.i + {_RS_N - 1}], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - {_RS_N - 1})) u(i)
  WHERE len(ws) >= {_RS_N}
),
rep AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (SELECT g.doc_id, g.pos FROM g JOIN rep USING (gram)),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_RS_N - 1} AS e
  FROM isl GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(MAX(e - s + 1) AS BIGINT) AS max_span_words,
       CAST(SUM(e - s + 1) AS BIGINT) AS repeated_words_total
FROM spans GROUP BY doc_id ORDER BY doc_id
"""


def dedup_repeated_substring_erased_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The exact-substring span query served from the ERASED gram index
    (plans/materialize.erased_gram_index_tables): the UNCHANGED
    consumer — postings ⋈ repeated-keys on the 8-byte gk, per-document
    islands merge, zero text scans — over tables repaired by
    plans/materialize.erase_grams (filter-out postings rewrite +
    touched-keys-only gram_rep repair). The oracle recomputes the whole
    span analysis from documents-that-were-never-ingested, so a green
    row proves index SURGERY == never-saw: spans shrink where a
    repeated gram lost its only other witness, and every remaining
    doc's span set is exactly the from-scratch one.

    100-TB shape: identical to dedup_repeated_substring_read (the
    erase rewrite happened at maintenance time); reads touch only
    index rows."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        erased_gram_index_tables,
    )

    return _spans_over(erased_gram_index_tables(spark, sf_dir), spark)


def _oracle_full() -> str:
    """The plain full-corpus span recomputation (identical to the
    dedup_repeated_substring oracle) — what the APPENDED index must
    reproduce: an append is correct iff readers cannot tell it from a
    never-split build."""
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, u.i - 1 AS pos,
         array_to_string(ws[u.i : u.i + {_RS_N - 1}], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - {_RS_N - 1})) u(i)
  WHERE len(ws) >= {_RS_N}
),
rep AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (SELECT g.doc_id, g.pos FROM g JOIN rep USING (gram)),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_RS_N - 1} AS e
  FROM isl GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(MAX(e - s + 1) AS BIGINT) AS max_span_words,
       CAST(SUM(e - s + 1) AS BIGINT) AS repeated_words_total
FROM spans GROUP BY doc_id ORDER BY doc_id
"""


def _spans_over(tables: dict[str, str], spark: SparkSession) -> DataFrame:
    """The shared span consumer: postings ⋈ repeated-keys on gk, then
    hits dedup on (doc_id, pos) BEFORE the islands window. The dedup is
    load-bearing, not defensive: append_grams documents an at-least-
    once posture (a crash-retried append re-appends identical postings
    rows), and a duplicate position would split the row_number-based
    island grouping in _repeated_spans — wrong n_spans on exactly the
    replayed docs.

    Spelled as a lag-compare INSIDE the islands window partitioning
    (partitionBy doc_id / orderBy pos — duplicates are exactly the rows
    whose lag(pos) equals pos, tie order irrelevant), NOT as
    dropDuplicates([doc_id, pos]): the latter hash-partitions on BOTH
    columns, which does not satisfy the window's doc_id clustering, so
    Catalyst would insert a second full exchange of the hits set on
    every driver read (caught in the round-12 self-review). This form
    shares the window's single shuffle and sort. Every gram read path
    (batch, erased, appended, compacted, streamed) goes through here so
    none can drift."""
    g = spark.read.parquet(tables["gram_postings"])
    rep = spark.read.parquet(tables["gram_rep"])
    hits = g.join(rep, "gk").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    deduped = (
        hits.withColumn("_prev", F.lag("pos").over(wd))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("pos")))
        .drop("_prev")
    )
    return _repeated_spans(deduped)


def dedup_repeated_substring_appended_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The exact-substring span query served from the INCREMENTALLY
    APPENDED gram index (plans/materialize.appended_gram_index_tables:
    base build on the doc_id%4!=3 three-quarters, held-out quarter
    folded in by append_grams): the UNCHANGED consumer over it must
    equal the plain full-corpus recomputation — including RETROACTIVE
    spans in base docs whose gram found its second witness in the
    appended batch (the touched-keys gram_rep repair is what makes
    those appear without re-aggregating the corpus)."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        appended_gram_index_tables,
    )

    return _spans_over(appended_gram_index_tables(spark, sf_dir), spark)


def dedup_repeated_substring_erased_appended_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The span query over the APPENDED-then-ERASED gram index
    (plans/materialize.erased_appended_gram_index_tables) — the last
    cell of the gram lifecycle matrix (build x append x erase, the
    gram twin of vector_ann_erased_appended_topk): appends land as
    ordinary postings files, so erase_grams needs no append-awareness,
    and the never-ingested oracle pins that the composition still
    equals never-saw."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        erased_appended_gram_index_tables,
    )

    return _spans_over(erased_appended_gram_index_tables(spark, sf_dir), spark)


def dedup_repeated_substring_streamed_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The span query over the gram index built by the STREAMING
    maintainer (plans/materialize.streamed_gram_index_tables: an actual
    start_gram_index_stream micro-batch run over three arrival files,
    with one crash-replayed epoch baked in): green against the plain
    full-corpus oracle proves streamed == batch equivalence AND
    at-least-once duplicate tolerance for the gram family, the same
    contract pipeline_manifest_streamed pins for the shingle index.

    The baked-in replayed epoch's duplicate (doc_id, pos) postings are
    absorbed by the shared consumer's dedup (see :func:`_spans_over` —
    since round 12 EVERY gram read path dedups, because the at-least-
    once posture belongs to append_grams itself, not just to this
    stream)."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        streamed_gram_index_tables,
    )

    return _spans_over(streamed_gram_index_tables(spark, sf_dir), spark)


def dedup_repeated_substring_compacted_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The span query over the APPENDED-then-COMPACTED gram index
    (plans/materialize.compacted_gram_index_tables) — compact_grams'
    OPTIMIZE/background-merge analog pinned at the DRIVER gate instead
    of pytest-only (VERDICT r11 ask #5): appends accumulate small
    gk-overlapping postings parts, the merge re-establishes one global
    gk sort, and green against the plain full-corpus oracle proves the
    merge changed file LAYOUT only, never row sets — the way
    pipeline_cascade_compacted_live completes the warehouse matrix.

    100-TB shape: identical consumer plan to
    dedup_repeated_substring_read, but over the layout a production
    index actually has after maintenance — few files, one global gk
    sort, row-group stats serving key probes again."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        compacted_gram_index_tables,
    )

    return _spans_over(compacted_gram_index_tables(spark, sf_dir), spark)


#: name -> (engine fn, oracle SQL builder) — what ``register()`` activates.
def r11b_rows():
    return {
        "dedup_repeated_substring_erased_read": (
            dedup_repeated_substring_erased_read,
            _oracle_erased(),
        ),
        "dedup_repeated_substring_appended_read": (
            dedup_repeated_substring_appended_read,
            _oracle_full(),
        ),
        "dedup_repeated_substring_erased_appended_read": (
            dedup_repeated_substring_erased_appended_read,
            _oracle_erased(),
        ),
        "dedup_repeated_substring_streamed_read": (
            dedup_repeated_substring_streamed_read,
            _oracle_full(),
        ),
        # round 12: the compacted cell (VERDICT r11 ask #5) — merge
        # invisibility at the driver gate, completing the gram matrix
        "dedup_repeated_substring_compacted_read": (
            dedup_repeated_substring_compacted_read,
            _oracle_full(),
        ),
    }


def register() -> None:
    """Activate the gram-lifecycle rows in the global query registry.

    Deferred from round 11 (window was full — see the module
    docstring); round 12 calls this from queries/__init__ and fronts
    the names in ``__spark_entry__._PRIORITY``."""
    for name, (fn, oracle) in r11b_rows().items():
        query(name, oracle)(fn)
