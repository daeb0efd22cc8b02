"""Round-9 ClickHouse analogs: secondary skip indexes.

The reference's tables lean on ClickHouse granule skipping beyond the
sort key (init.sql:19,32,46,96 — the sparse primary index plus implicit
per-column min/max). This module exercises the Spark-side analog added
in plans/layout.py: per-column Parquet BLOOM FILTERS on the
high-cardinality lookup columns (``layout.BLOOM_KEYS``), written by the
cascade and preserved by compaction and mutations. A point lookup on a
non-sort-key column skips whole row groups at the parquet-mr layer —
the same read-elimination ClickHouse gets from a ``bloom_filter`` skip
index (tests/test_skip_index.py pins row-groups-skipped > 0 through
parquet-java's own bloom readers, the code path Spark's scan uses).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans.materialize import NEW_SOURCES
from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

_NEW_SRC_SQL = "('" + "', '".join(NEW_SOURCES) + "')"


@query(
    "table_skip_index_lookup",
    f"""
SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars_stored
FROM documents
WHERE source IN {_NEW_SRC_SQL} AND doc_id % 23 = 0
ORDER BY doc_id
""",
)
def table_skip_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on a NON-sort-key column of the cascade's analytics
    table (``message_id``; its sort key is client/project/user/session/
    timestamp, so min/max stats never exclude a row group — only the
    bloom skip index does). The lookup keys are literal strings, so the
    predicate reaches the parquet scan as PushedFilters and parquet-mr's
    row-group filter consults the bloom before decoding a single page —
    ClickHouse's ``INDEX ... TYPE bloom_filter GRANULARITY n`` read path
    (init.sql:19's granule skipping, generalized off the sort key).

    The key list is collected from the documents table first (bounded:
    |batch docs| / 23 ids — the day-2 batch is day-volume-bounded, and
    the modulus keeps the IN-list in the hundreds even at 10^7-doc
    days). The ``project_code`` guard keeps the audit scoped to document
    streams (embedding messages carry their own id space — vec ids and
    doc ids can collide as bare strings)."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import ANALYTICS_TABLE

    docs = load_table(spark, sf_dir, "documents")
    ids = [
        str(r[0])
        for r in docs.filter(
            F.col("source").isin(*NEW_SOURCES)
            & (F.pmod(F.col("doc_id"), F.lit(23)) == 0)
        )
        .select("doc_id")
        .collect()  # bounded: |batch docs| / 23
    ]
    t = ingested_index_tables(spark, sf_dir)
    ana = spark.read.parquet(os.path.join(t["warehouse"], ANALYTICS_TABLE))
    return (
        ana.filter(
            F.col("message_id").isin(ids)
            & F.col("project_code").isin(*NEW_SOURCES)
        )
        .select(
            F.col("message_id").cast("long").alias("doc_id"),
            F.col("project_code").alias("source"),
            F.length("message_text").cast("long").alias("n_chars_stored"),
        )
        .orderBy("doc_id")
    )


@query(
    "system_query_log",
    """
SELECT CAST(seq AS BIGINT) AS seq, user_name, event_type,
       CAST(result_rows AS BIGINT) AS result_rows, error
FROM (VALUES
  (1, 'analyst', 'QueryFinish',
   (SELECT count(DISTINCT event_type) FROM events), ''),
  (2, 'analyst', 'QueryFinish',
   (SELECT count(DISTINCT source) FROM documents), ''),
  (3, 'analyst', 'ExceptionBeforeStart', 0, 'QuotaExceeded'),
  (4, 'auditor', 'ExceptionBeforeStart', 0, 'ReadonlyViolation'),
  (5, 'ingest', 'QueryFinish', 1, '')
) AS t(seq, user_name, event_type, result_rows, error)
ORDER BY seq
""",
)
def system_query_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.query_log`` analog (VERDICT r8 #6; the reference's
    deployment reads ClickHouse's query_log for per-query accounting —
    users.xml's all-zero quotas exist to FEED it). A deterministic
    session script runs through the AdmissionController — two analyst
    aggregates (admitted, finished, result rows charged), a third
    analyst query rejected by the ``max_queries=2`` quota, a readonly
    auditor's DELETE refused at parse, and one ingest count — and the
    controller's query_log is returned as a table. The oracle replays
    the same admission rules by hand and recomputes each finished
    query's result_rows from the fixture views, so the row is
    data-dependent, not a constant: a wrong rejection order, a missed
    log event, or a result-row miscount all hash-mismatch.

    Scale shape: the log is O(queries issued) driver-side state (a
    deployment rotates it like ClickHouse does); the three executed
    aggregates are ordinary partial+final hash aggregates."""
    from go_nats_to_clickhouse_spark.admission import (
        AdmissionController,
        Profile,
        Quota,
        QuotaExceeded,
        ReadonlyViolation,
        User,
    )

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    ctl = AdmissionController(
        users={
            "analyst": User("analyst", quota="small"),
            "auditor": User("auditor", profile="readonly"),
            "ingest": User("ingest"),
        },
        profiles={
            "default": Profile("default"),
            "readonly": Profile("readonly", readonly=True),
        },
        quotas={
            "default": Quota(duration_seconds=3600.0),
            "small": Quota(duration_seconds=3600.0, max_queries=2),
        },
    )
    script = (
        ("analyst", "SELECT event_type, count(*) AS c FROM events GROUP BY event_type"),
        ("analyst", "SELECT source, count(*) AS c FROM documents GROUP BY source"),
        ("analyst", "SELECT count(*) AS c FROM events"),  # quota-rejected
        ("auditor", "DELETE FROM events WHERE 1 = 1"),  # readonly-refused
        ("ingest", "SELECT count(*) AS c FROM events"),
    )
    for user, sql in script:
        try:
            ctl.execute(spark, user, sql)
        except (QuotaExceeded, ReadonlyViolation):
            pass  # the rejection itself is the logged event under test
    return (
        ctl.query_log_df(spark)
        .select("seq", "user_name", "event_type", "result_rows", "error")
        .orderBy("seq")
    )


@query(
    "table_token_skip_search",
    f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
WHERE source IN {_NEW_SRC_SQL}
  AND list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'dup')
ORDER BY doc_id
""",
)
def table_token_skip_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``hasToken(message_text, 'dup')`` over the cascade's analytics
    table, served through the TOKEN-bloom sidecar — the ClickHouse
    ``INDEX ... TYPE tokenbf_v1`` analog (plans/layout.py
    ``build_token_bloom``/``search_token_pruned``). The equality blooms
    of ``table_skip_index_lookup`` cannot prune this shape: a token
    match reaches inside arbitrarily long text values, so file
    elimination must test membership over each file's token VOCABULARY.
    Files whose bloom lacks any of the token's k bits are never opened;
    an exact token filter re-checks the candidates, so bloom false
    positives cost I/O only, never correctness
    (tests/test_token_bloom.py pins files-skipped > 0 and full-scan
    equality on controlled data; this row pins end-to-end correctness
    against the base corpus through the ingest cascade).

    Scale shape: the sidecar is one bitmap row per part (files x 4 KB,
    driver collect bounded by part count); index build is a
    codegen-only tokenize + a (file, bit)-bounded shuffle; rebuilt
    after part rewrites like ClickHouse rebuilds skip indexes on
    merge."""
    from go_nats_to_clickhouse_spark.plans import layout as L
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import ANALYTICS_TABLE

    t = ingested_index_tables(spark, sf_dir)
    ana_path = os.path.join(t["warehouse"], ANALYTICS_TABLE)
    if not os.path.isdir(os.path.join(ana_path, L.TOKEN_BLOOM_DIR)):
        L.build_token_bloom(spark, ana_path, "message_text")
    hits, _report = L.search_token_pruned(spark, ana_path, "message_text", "dup")
    return (
        hits.filter(F.col("project_code").isin(*NEW_SOURCES))
        .select(
            F.col("message_id").cast("long").alias("doc_id"),
            F.length("message_text").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "table_ngram_skip_like",
    f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
WHERE source IN {_NEW_SRC_SQL}
  AND contains(lower(text), ' dup')
ORDER BY doc_id
""",
)
def table_ngram_skip_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``LIKE '% dup%'`` over the cascade's analytics table, served
    through the N-GRAM bloom sidecar — the ClickHouse ``ngrambf_v1``
    analog (plans/layout.py ``build_ngram_bloom``/``search_like_pruned``),
    the substring sibling of ``table_token_skip_search``. The needle
    CROSSES a token boundary (separator + 'dup'), so the token index has no
    entry for it by construction; pruning must come from the needle's
    character 3-grams, every one of which a candidate file's bloom must
    contain. False positives cost I/O only (exact ``contains`` re-check);
    false negatives impossible (shared gram extraction + hash family).

    Scale shape: identical to the token index — bitmap-per-part sidecar
    (16 Kbit for the denser char-3-gram vocabulary), part-count-bounded
    collects, rebuild-on-part-rewrite (tests/test_ngram_bloom.py pins
    pruning > 0, cross-token correctness, and the sub-gram full-scan
    fallback)."""
    from go_nats_to_clickhouse_spark.plans import layout as L
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import ANALYTICS_TABLE

    t = ingested_index_tables(spark, sf_dir)
    ana_path = os.path.join(t["warehouse"], ANALYTICS_TABLE)
    if not os.path.isdir(os.path.join(ana_path, L.NGRAM_BLOOM_DIR)):
        L.build_ngram_bloom(spark, ana_path, "message_text")
    hits, _report = L.search_like_pruned(
        spark, ana_path, "message_text", " dup"
    )
    return (
        hits.filter(F.col("project_code").isin(*NEW_SOURCES))
        .select(
            F.col("message_id").cast("long").alias("doc_id"),
            F.length("message_text").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )
