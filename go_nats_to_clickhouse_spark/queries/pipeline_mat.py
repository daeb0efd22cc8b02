"""Materialized-pipeline read path: the training manifest built by
READING persisted pipeline tables instead of recomputing the dedup /
quality stages inline.

This is the reference's own architecture at pipeline scale: its
materialized views precompute at ingest so queries read precomputed
tables (init.sql:100-121). ``pipeline_training_manifest``
(queries/clickhouse_r5.py) stays as the from-scratch variant; the queries
here are what a PRODUCTION manifest job runs daily — parquet scans of the
ingest-time tables (plans/materialize.py) plus a small day-2 incremental
batch, with ZERO shingle explodes and zero corpus text reads at query
time.

Incremental dedup semantics (deliberate, documented design):

* The day-1 corpus (sources other than src0/src1) was near-dup-resolved
  at ingest with the full exact-Jaccard-verified pipeline — that result is
  the ``corpus_survivors`` table.
* The day-2 batch (src0/src1) is deduplicated against the corpus and
  within itself using the SIGNATURE index only: banded-LSH candidates,
  then minhash-estimated Jaccard (>= 8 of 16 matching components, i.e.
  est >= 0.5) as the accept test. Exact verification would need corpus
  shingle sets — rescanning 100 TB of text per daily batch, which is
  precisely what the signature index exists to avoid. The estimate is an
  integer component count, so both engines agree bit-for-bit.
* A batch doc colliding with a corpus survivor is dropped (the corpus
  copy wins — stable doc identity across days); the remaining batch docs
  near-dup-resolve among themselves keeping the min doc_id.
* The Gopher gate bit was computed at ingest (``doc_quality``, same
  expression as text_gopher_rules) and is just read back.

The oracle recomputes all of it from the source ``documents`` view —
bit-for-bit banding (md5 buckets, shared universal-hash constants), exact
Jaccard for the corpus-internal stage, integer signature-match counts for
the incremental stage — so a green row proves the persisted tables carry
exactly the semantics they claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.hints import bounded
from pyspark.sql.window import Window

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.text import _mh_mins_sql, _SH_CTE
from go_nats_to_clickhouse_spark.plans.materialize import (
    DAY3_SOURCES,
    DAY4_SOURCES,
    ERASE3_MOD,
    ERASE_MOD,
    NEW_SOURCES,
    pipeline_tables,
)

_SIG_LIST = ", ".join(f"m{s}" for s in range(16))

#: integer signature agreement — est Jaccard >= 0.5 is >= 8 of 16 equal
#: components; pure integer count, no float threshold to diverge on
_EST_MATCH_SQL = (
    "list_sum(list_transform(range(1, 17), "
    "i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) >= 8"
)

_NEW_SRC_SQL = "('" + "', '".join(NEW_SOURCES) + "')"
_DAY3_SRC_SQL = "('" + "', '".join(DAY3_SOURCES) + "')"
_DAY4_SRC_SQL = "('" + "', '".join(DAY4_SOURCES) + "')"

#: signature/banding CTEs over ALL documents (per-doc definitions are
#: generation-independent) — shared by every oracle in this module
_SIG_CTES = f"""based AS MATERIALIZED (
  SELECT doc_id, shingle,
         ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS base
  FROM sh
),
mh AS (
  SELECT doc_id,
         {_mh_mins_sql(16)}
  FROM based
  GROUP BY doc_id
),
sig AS MATERIALIZED (SELECT doc_id, [{_SIG_LIST}] AS sig FROM mh),
bands AS MATERIALIZED (
  SELECT doc_id, band,
         md5(array_to_string(list_transform(range(1, 5),
             r -> CAST(sig[band * 4 + r] AS VARCHAR)), '-')) AS bucket
  FROM sig, UNNEST(range(4)) AS t(band)
)"""

#: day-1 ingest: exact-verified survivors within `corp_ids` (each oracle
#: defines corp_ids for its own generation layout)
_EXACT_SURV_CTES = """ccand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
  WHERE a.doc_id IN (SELECT doc_id FROM corp_ids)
    AND b.doc_id IN (SELECT doc_id FROM corp_ids)
),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
ccommon AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM ccand c
  JOIN based x ON x.doc_id = c.doc_a
  JOIN based y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  GROUP BY 1, 2
),
cpairs AS (
  SELECT doc_a, doc_b
  FROM ccommon
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
),
cedges AS (
  SELECT doc_a AS u, doc_b AS v FROM cpairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM cpairs
),
cnodes AS (SELECT DISTINCT u AS node FROM cedges),
creach(node, r) AS (
  SELECT node, node FROM cnodes
  UNION
  SELECT e.u, creach.r FROM cedges e JOIN creach ON creach.node = e.v
),
ccomp AS (SELECT node AS doc_id, MIN(r) AS component FROM creach GROUP BY node),
corp_surv AS MATERIALIZED (
  SELECT d.doc_id FROM corp_ids d
  LEFT JOIN ccomp c ON c.doc_id = d.doc_id
  WHERE c.doc_id IS NULL OR c.component = d.doc_id
)"""

#: Gopher quality gate (same rules as text_gopher_rules)
_GPASS_CTES = """gw AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words,
         text
  FROM documents
),
gpass AS MATERIALIZED (
  SELECT doc_id FROM gw
  WHERE len(words) BETWEEN 50 AND 100000
    AND CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
        / len(words) BETWEEN 3.0 AND 10.0
    AND CAST(len(list_filter(words, x -> regexp_matches(x, '^[A-Za-z]+$')))
        AS DOUBLE) / len(words) >= 0.8
    AND CAST(length(text) - length(replace(replace(text, '#', ''), '…', ''))
        AS DOUBLE) / greatest(length(text), 1) < 0.1
    AND len(list_filter(words, x -> list_contains(
        ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
        lower(x)))) >= 2
)"""


def _est_dedup_ctes(p: str, batch_cte: str, corpus_cte: str) -> str:
    """CTE chain ``{p}xdup .. {p}surv``: the signature-only incremental
    dedup of one batch generation against a corpus CTE — collisions with
    the corpus drop the batch copy, then the corpus-clean remainder
    near-dup-resolves within itself keeping the component min. Exactly
    the semantics of batch_survivors_from, per generation."""
    return f"""{p}xdup AS MATERIALIZED (
  SELECT DISTINCT x.new_id FROM (
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
    FROM bands n
    JOIN bands c ON c.band = n.band AND c.bucket = n.bucket
    WHERE n.doc_id IN (SELECT doc_id FROM {batch_cte})
      AND c.doc_id IN (SELECT doc_id FROM {corpus_cte})
  ) x
  JOIN sig sa ON sa.doc_id = x.new_id
  JOIN sig sb ON sb.doc_id = x.corpus_id
  WHERE {_EST_MATCH_SQL}
),
{p}b1 AS MATERIALIZED (
  SELECT doc_id FROM {batch_cte}
  WHERE doc_id NOT IN (SELECT new_id FROM {p}xdup)
),
{p}wpairs AS MATERIALIZED (
  SELECT w.doc_a, w.doc_b FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id
    WHERE a.doc_id IN (SELECT doc_id FROM {p}b1)
      AND b.doc_id IN (SELECT doc_id FROM {p}b1)
  ) w
  JOIN sig sa ON sa.doc_id = w.doc_a
  JOIN sig sb ON sb.doc_id = w.doc_b
  WHERE {_EST_MATCH_SQL}
),
{p}wedges AS (
  SELECT doc_a AS u, doc_b AS v FROM {p}wpairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM {p}wpairs
),
{p}wnodes AS (SELECT DISTINCT u AS node FROM {p}wedges),
{p}wreach(node, r) AS (
  SELECT node, node FROM {p}wnodes
  UNION
  SELECT e.u, {p}wreach.r
  FROM {p}wedges e JOIN {p}wreach ON {p}wreach.node = e.v
),
{p}wcomp AS (
  SELECT node AS doc_id, MIN(r) AS component FROM {p}wreach GROUP BY node
),
{p}surv AS MATERIALIZED (
  SELECT d.doc_id FROM {p}b1 d
  LEFT JOIN {p}wcomp c ON c.doc_id = d.doc_id
  WHERE c.doc_id IS NULL OR c.component = d.doc_id
)"""


def _kept_cte() -> str:
    """Shared oracle prefix: every CTE up to `kept` (doc_id, from_batch)
    for the two-generation (day-1 corpus + day-2 batch) layout — used by
    the incremental/streamed manifests and the dataset card."""
    return f"""
WITH RECURSIVE {_SH_CTE.strip().rstrip()},
{_SIG_CTES},
new_ids AS (SELECT doc_id FROM documents WHERE source IN {_NEW_SRC_SQL}),
corp_ids AS (SELECT doc_id FROM documents WHERE source NOT IN {_NEW_SRC_SQL}),
{_EXACT_SURV_CTES},
{_est_dedup_ctes('', 'new_ids', 'corp_surv')},
{_GPASS_CTES},
kept AS (
  SELECT doc_id, FALSE AS from_batch FROM corp_surv
  WHERE doc_id IN (SELECT doc_id FROM gpass)
  UNION ALL
  SELECT doc_id, TRUE AS from_batch FROM surv
  WHERE doc_id IN (SELECT doc_id FROM gpass)
)
"""


def _day3_kept_cte() -> str:
    """Three-generation oracle prefix, entirely from the source
    ``documents`` view: exact-verified day-1 survivors on the corpus
    EXCLUDING the held-out day-3 sources, day-2 promoted via the
    signature-only dedup, then day-3 resolved against the promoted
    two-generation corpus — the ground truth for promote_batch +
    gen3_tables + the unchanged read-path consumer."""
    return f"""
WITH RECURSIVE {_SH_CTE.strip().rstrip()},
{_SIG_CTES},
new_ids AS (SELECT doc_id FROM documents WHERE source IN {_NEW_SRC_SQL}),
d3_ids AS (SELECT doc_id FROM documents WHERE source IN {_DAY3_SRC_SQL}),
corp_ids AS (SELECT doc_id FROM documents
             WHERE source NOT IN {_NEW_SRC_SQL}
               AND source NOT IN {_DAY3_SRC_SQL}),
{_EXACT_SURV_CTES},
{_est_dedup_ctes('', 'new_ids', 'corp_surv')},
promoted AS MATERIALIZED (
  SELECT doc_id FROM corp_surv
  UNION ALL
  SELECT doc_id FROM surv
),
{_est_dedup_ctes('g3', 'd3_ids', 'promoted')},
{_GPASS_CTES},
kept AS (
  SELECT doc_id, FALSE AS from_batch FROM promoted
  WHERE doc_id IN (SELECT doc_id FROM gpass)
  UNION ALL
  SELECT doc_id, TRUE AS from_batch FROM g3surv
  WHERE doc_id IN (SELECT doc_id FROM gpass)
)
"""


def _day4_kept_cte() -> str:
    """Four-generation oracle prefix, entirely from the source
    ``documents`` view — the N=3 induction instance: exact day-1
    survivors on the corpus excluding BOTH held-out days, day-2 promoted
    (est chain), day-3 promoted on top of that, day-4 resolved against
    the three-generation promoted corpus. One more `AS MATERIALIZED`
    generation on the day-3 chain (the DuckDB CTE re-inlining lesson)."""
    return f"""
WITH RECURSIVE {_SH_CTE.strip().rstrip()},
{_SIG_CTES},
new_ids AS (SELECT doc_id FROM documents WHERE source IN {_NEW_SRC_SQL}),
d3_ids AS (SELECT doc_id FROM documents WHERE source IN {_DAY3_SRC_SQL}),
d4_ids AS (SELECT doc_id FROM documents WHERE source IN {_DAY4_SRC_SQL}),
corp_ids AS (SELECT doc_id FROM documents
             WHERE source NOT IN {_NEW_SRC_SQL}
               AND source NOT IN {_DAY3_SRC_SQL}
               AND source NOT IN {_DAY4_SRC_SQL}),
{_EXACT_SURV_CTES},
{_est_dedup_ctes('', 'new_ids', 'corp_surv')},
promoted AS MATERIALIZED (
  SELECT doc_id FROM corp_surv
  UNION ALL
  SELECT doc_id FROM surv
),
{_est_dedup_ctes('g3', 'd3_ids', 'promoted')},
promoted2 AS MATERIALIZED (
  SELECT doc_id FROM promoted
  UNION ALL
  SELECT doc_id FROM g3surv
),
{_est_dedup_ctes('g4', 'd4_ids', 'promoted2')},
{_GPASS_CTES},
kept AS (
  SELECT doc_id, FALSE AS from_batch FROM promoted2
  WHERE doc_id IN (SELECT doc_id FROM gpass)
  UNION ALL
  SELECT doc_id, TRUE AS from_batch FROM g4surv
  WHERE doc_id IN (SELECT doc_id FROM gpass)
)
"""


def _manifest_tail_sql(salt: str) -> str:
    """Shared oracle finalizer: kept -> (doc_id, from_batch, shard, pos)."""
    return f""",
m AS (
  SELECT doc_id, from_batch,
         md5('{salt}' || CAST(doc_id AS VARCHAR)) AS h,
         ('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)),
                         1, 7))::BIGINT % 8 AS shard
  FROM kept
)
SELECT doc_id, from_batch, CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM m ORDER BY shard, pos
"""


def _incremental_manifest_oracle() -> str:
    return _kept_cte() + _manifest_tail_sql("manifest-2:")


_CARD_TAIL_SQL = """
SELECT d.source, d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE k.from_batch) AS BIGINT) AS n_from_batch,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       CAST(round(100.0 * count(*) /
            (SELECT count(*) FROM kept), 4) AS DOUBLE) AS pct_of_corpus
FROM kept k JOIN documents d ON d.doc_id = k.doc_id
GROUP BY d.source, d.lang
ORDER BY d.source, d.lang
"""


def _dataset_card_oracle() -> str:
    return _kept_cte() + _CARD_TAIL_SQL


def _est_matches(sig_a, sig_b):
    """Count of equal signature components — the integer form of the
    minhash Jaccard estimate (>= 8 of 16 <=> est >= 0.5)."""
    return F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda a, x: a + x,
    )


def _kept_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared read-path keep-set (doc_id, from_batch) over the
    batch-built materialized tables. See pipeline_manifest_incremental for
    the scale shape; pipeline_dataset_card reuses this stage verbatim."""
    t = pipeline_tables(spark, sf_dir)
    return kept_docs_from(
        spark.read.parquet(t["doc_bands"]),
        spark.read.parquet(t["doc_quality"]),
        spark.read.parquet(t["corpus_survivors"]),
    )


def kept_docs_from(
    bands: DataFrame, qual: DataFrame, surv: DataFrame
) -> DataFrame:
    """Keep-set (doc_id, from_batch) from the three index frames:
    materialized corpus survivors + incremental-deduped day-2 batch, both
    gated by the ingest-time Gopher bit. Table-frame-parameterized so the
    batch-built, streamed-index, and promoted-corpus (day-3) read paths
    all run the SAME consumer.

    At-least-once tolerance (the streamed maintainer's contract,
    plans/materialize.append_batch_index: a crash-replayed epoch
    re-appends identical rows for the same doc_ids): this consumer must
    be duplicate-INVARIANT, not duplicate-assuming. Policy:

    * ``qual`` and ``surv`` are deduped by doc_id at the read — their
      rows feed the keep-set union directly, where a duplicate would
      duplicate manifest rows. Replayed rows are bit-identical (the index
      functions are deterministic), so keeping any one is exact. Narrow
      tables (doc_id + bits), so the dedup shuffle is bytes-per-doc.
    * ``doc_bands`` is deliberately NOT deduped: every consumption path
      absorbs duplicates by construction — ``xdup`` feeds a left_anti
      (set semantics) and ``wpairs`` feeds connected_components, which
      dedups its undirected edge set. Deduping here would shuffle the
      wide sig-carrying rows in the exactly-once common case to save
      nothing; a replayed epoch costs only its share of candidate rows.

    Pinned by tests/test_materialize.py::TestReplayedEpochIdempotence —
    double-appending one batch must leave the manifest hash unchanged."""
    # (r12 note: snapshotting these deduped frames was TRIED and reverted
    # — localCheckpoint erases the dropDuplicates hash(doc_id)
    # partitioning, so every downstream doc_id join re-exchanged what the
    # aggregate's own partitioning previously satisfied; measured net
    # slower on the manifest family. AQE's runtime stage reuse already
    # dedupes the identical dedup subtrees.)
    qual = qual.dropDuplicates(["doc_id"])
    surv = surv.dropDuplicates(["doc_id"])
    new_ids = qual.filter(F.col("is_new")).select("doc_id")
    new_surv = batch_survivors_from(bands, new_ids, surv)

    # quality gate read back from the ingest-time bit
    gpass = qual.filter(F.col("passes_gopher")).select("doc_id")
    return (
        surv.join(gpass, "doc_id", "left_semi")
        .select("doc_id", F.lit(False).alias("from_batch"))
        .unionByName(
            new_surv.join(gpass, "doc_id", "left_semi").select(
                "doc_id", F.lit(True).alias("from_batch")
            )
        )
    )


def batch_survivors_from(
    bands: DataFrame, new_ids: DataFrame, surv: DataFrame
) -> DataFrame:
    """The batch's dedup survivors (doc_id), signature-index only:
    batch-vs-corpus collisions drop the batch copy, then the corpus-clean
    remainder near-dup-resolves among itself keeping the component min.
    ``new_ids`` and ``surv`` must arrive deduped (callers:
    :func:`kept_docs_from` and plans/materialize.promote_batch — the
    promotion op runs THIS function, so the corpus a day-3 manifest reads
    was promoted by exactly the semantics the oracle recomputes)."""
    from go_nats_to_clickhouse_spark.operators.graph import connected_components

    # Batch vs corpus-survivor collisions through the persisted
    # index. The index carries each row's signature (denormalized at
    # ingest, see plans/materialize.py), so the ONE bucket equi-join both
    # generates candidates and verifies them — no signature-table joins.
    # The batch side broadcasts (batch-sized by definition); the corpus
    # index side only streams, never shuffles.
    nb = bands.filter(F.col("is_new")).select(
        F.col("doc_id").alias("new_id"), "band", "bucket",
        F.col("sig").alias("sig_a"),
    )
    cb = (
        bands.filter(~F.col("is_new"))
        .join(surv, "doc_id", "left_semi")
        .select("band", "bucket", F.col("sig").alias("sig_b"))
    )
    # no distinct on xdup — the left_anti below dedups by construction
    xdup = (
        cb.join(F.broadcast(bounded(nb, "ingest micro-batch, admission-bounded")), ["band", "bucket"])
        .filter(_est_matches(F.col("sig_a"), F.col("sig_b")) >= 8)
        .select("new_id")
    )
    # lazy checkpoint: connected_components' eager edge count materializes
    # this subtree once; without it the final job recomputes the whole
    # batch-vs-corpus stage a second time (same AQE ReusedExchange miss as
    # dedup_survivors documents).
    b1 = new_ids.join(
        xdup, new_ids["doc_id"] == xdup["new_id"], "left_anti"
    ).localCheckpoint(eager=False)

    # within-batch resolution among the corpus-clean docs (batch-sized;
    # signatures ride the same index rows, so verification is again part
    # of the bucket self-join)
    nb1 = nb.join(b1, nb["new_id"] == b1["doc_id"], "left_semi")
    l = nb1.select(F.col("new_id").alias("doc_a"), "band", "bucket", "sig_a")
    r = nb1.select(
        F.col("new_id").alias("doc_b"), "band", "bucket",
        F.col("sig_a").alias("sig_b"),
    )
    # no distinct: connected_components dedups its undirected edge set
    # itself, so a pair colliding in k bands costs k rows here, not a
    # shuffle
    wpairs = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(_est_matches(F.col("sig_a"), F.col("sig_b")) >= 8)
        .select("doc_a", "doc_b")
    )
    wcomp = connected_components(wpairs, shortcut=True).select(
        F.col("node").alias("c_doc"), "component"
    )
    return (
        b1.join(wcomp, b1["doc_id"] == F.col("c_doc"), "left")
        .filter(F.col("c_doc").isNull() | (F.col("component") == F.col("doc_id")))
        .select("doc_id")
    )


def manifest_rows(kept: DataFrame, salt: str = "manifest-2:") -> DataFrame:
    """Shared manifest finalizer: place a keep-set at deterministic
    salted-md5 positions in 8 shards. Used by the batch-built, streamed,
    and day-3 manifest variants (different salt per generation)."""
    h = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    sh = kept.select(
        "doc_id",
        "from_batch",
        h.alias("h"),
        (F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % 8).alias("shard"),
    )
    return sh.select(
        "doc_id",
        "from_batch",
        F.col("shard").cast("long").alias("shard"),
        F.row_number()
        .over(Window.partitionBy("shard").orderBy("h", "doc_id"))
        .cast("long")
        .alias("pos"),
    ).orderBy("shard", "pos")


@query("pipeline_manifest_incremental", _incremental_manifest_oracle())
def pipeline_manifest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 training manifest from the MATERIALIZED pipeline tables: the
    persisted corpus survivors + quality bits are read back (parquet
    scans), only the small day-2 batch is deduplicated — against the
    corpus via the persisted band/signature index, then within itself —
    and the combined keep-set is placed at deterministic salted-md5
    positions in 8 shards.

    Scale shape (the whole point): NO shingle explode and NO corpus text
    scan anywhere in this plan — the corpus contributes three narrow
    parquet scans (survivors, quality, index). The batch-vs-corpus
    candidate join broadcasts the batch's band table (batch-sized); the
    index side arrives bucket-sorted so row-group stats skip
    non-colliding buckets. Within-batch CC runs on a batch-sized graph.
    At 100 TB: daily manifest cost = O(batch + index scan), not
    O(corpus) — the reference's ingest-time-precompute contract
    (init.sql:100-121) applied to the dedup pipeline."""
    return manifest_rows(_kept_docs(spark, sf_dir))


_SHARD_REPORT_TAIL = """,
m AS (
  SELECT k.doc_id, k.from_batch,
         ('0x' || substr(md5('manifest-2:' || CAST(k.doc_id AS VARCHAR)),
                         1, 7))::BIGINT % 8 AS shard,
         d.n_chars
  FROM kept k JOIN documents d ON d.doc_id = k.doc_id
),
per AS (
  SELECT shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) FILTER (WHERE from_batch) AS BIGINT) AS n_from_batch,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM m GROUP BY shard
),
g AS (
  SELECT CAST(max(n_docs) AS DOUBLE) / min(n_docs) AS doc_skew,
         CAST(max(total_chars) AS DOUBLE) / min(total_chars) AS char_skew
  FROM per
)
SELECT CAST(shard AS BIGINT) AS shard, n_docs, n_from_batch, total_chars,
       round(g.doc_skew, 4) AS doc_skew,
       round(g.char_skew, 4) AS char_skew
FROM per CROSS JOIN g
ORDER BY shard
"""


@query("pipeline_shard_report", _kept_cte() + _SHARD_REPORT_TAIL)
def pipeline_shard_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard balance audit — the loader-side twin of
    dedup_index_stats: per manifest shard, doc count, batch-arrival
    count, char volume, plus the global max/min skew ratios (same value
    on every row). These are the numbers a data-loader balance policy is
    set from: salted-md5 sharding (manifest_rows) promises near-uniform
    shards with no coordination, and this row makes that claim an
    OBSERVED quantity instead of an assumption — at 100 TB a skewed
    shard is a straggler epoch, noticed after a day of wasted GPU time
    if nobody measured. Read path: the same materialized keep-set as the
    manifest (no text scans); the documents join brings only n_chars.
    Skew ratios are a single IEEE division of exact integers (engine-
    portable) — deliberately NOT a thresholded pass flag, because an
    8-shard split of a fixture-sized keep-set has binomial fluctuation a
    threshold would couple to."""
    from go_nats_to_clickhouse_spark.schemas import load_table

    kept = _kept_docs(spark, sf_dir)
    h = F.md5(F.concat(F.lit("manifest-2:"), F.col("doc_id").cast("string")))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    m = kept.select(
        "doc_id",
        "from_batch",
        (F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % 8).alias("shard"),
    ).join(d, "doc_id")
    per = m.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("from_batch").cast("long")).cast("long").alias("n_from_batch"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    g = per.agg(
        (F.max("n_docs").cast("double") / F.min("n_docs")).alias("doc_skew"),
        (F.max("total_chars").cast("double") / F.min("total_chars")).alias(
            "char_skew"
        ),
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "n_from_batch",
            "total_chars",
            F.round("doc_skew", 4).alias("doc_skew"),
            F.round("char_skew", 4).alias("char_skew"),
        )
        .orderBy("shard")
    )


@query("pipeline_dataset_card", _dataset_card_oracle())
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: per-(source, lang) composition of the deliverable
    corpus — doc counts, how many arrived in the day-2 batch, character
    volume, and each cell's percentage of the kept corpus. The question
    every training run answers before it starts ("what is actually in my
    mix?"), served from the same materialized read path as the manifest:
    the keep-set computation is :func:`_kept_docs` verbatim (no shingle
    explode, no corpus text scan), and the only documents.parquet access
    is a narrow metadata projection (doc_id, source, lang, n_chars) —
    column pruning keeps the text column unread.

    Scale shape: keep-set ⋈ metadata is a doc_id equi-join; the group-by
    is vocabulary-sized (sources x langs). The corpus-total for the
    percentage is a scalar agg reused via a 1-row broadcast cross join —
    the standard share-of-total shape."""
    return _dataset_card(spark, sf_dir, _kept_docs(spark, sf_dir))


def _dataset_card(
    spark: SparkSession, sf_dir: str, kept: DataFrame
) -> DataFrame:
    """Shared card finalizer over any generation's keep-set (see
    pipeline_dataset_card for the scale shape)."""
    from go_nats_to_clickhouse_spark.schemas import load_table

    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    joined = kept.join(meta, "doc_id")
    total = kept.agg(F.count(F.lit(1)).alias("_total"))
    return (
        joined.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("from_batch")).alias("n_from_batch"),
            F.sum("n_chars").alias("total_chars"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_from_batch").cast("long").alias("n_from_batch"),
            F.col("total_chars").cast("long").alias("total_chars"),
            F.round(
                F.lit(100.0) * F.col("n_docs") / F.col("_total"), 4
            ).alias("pct_of_corpus"),
        )
        .orderBy("source", "lang")
    )


@query("pipeline_manifest_streamed", _incremental_manifest_oracle())
def pipeline_manifest_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-2 manifest with the batch's index rows produced BY THE
    STREAMING MAINTAINER (plans/materialize.streamed_index_tables): the
    batch docs arrive as files, start_doc_index_stream's foreachBatch
    epochs append their signature/band/quality rows, and one epoch is
    re-appended to bake the documented crash-replay duplicate into the
    published table. The corpus side (day-1 bulk ingest) still comes from
    the batch-built tables — exactly the production split: bulk-indexed
    corpus + streamed daily arrivals.

    Same oracle as pipeline_manifest_incremental, so a green row proves
    streamed == batch row equivalence AND at-least-once duplicate
    tolerance end-to-end through the ACTUAL micro-batch machinery — the
    driver-checked promotion of tests/test_materialize.py's
    streamed-equals-batch unit test (VERDICT r5 #6, #1). Consumer code is
    kept_docs_from, unchanged."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        streamed_index_tables,
    )

    t = pipeline_tables(spark, sf_dir)
    s = streamed_index_tables(spark, sf_dir)
    corp = ~F.col("is_new")
    bands = (
        spark.read.parquet(t["doc_bands"])
        .filter(corp)
        .unionByName(spark.read.parquet(s["doc_bands"]))
    )
    qual = (
        spark.read.parquet(t["doc_quality"])
        .filter(corp)
        .unionByName(spark.read.parquet(s["doc_quality"]))
    )
    surv = spark.read.parquet(t["corpus_survivors"])
    return manifest_rows(kept_docs_from(bands, qual, surv))


@query("pipeline_manifest_ingested", _incremental_manifest_oracle())
def pipeline_manifest_ingested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-2 manifest with the batch's index rows produced by the
    FULL COMPOSED SERVICE (plans/materialize.ingested_index_tables): the
    batch documents were published as wire envelopes, consumed by ONE
    checkpointed streaming run whose every micro-batch fed BOTH the
    raw/union/analytics cascade and the index maintainers, with one
    epoch deliberately re-applied (crash-replay duplicate) — the
    reference's ingest-triggered-MV model (init.sql:49-58 + 100-121
    firing on main.go:154's INSERT) closed end-to-end over the
    LLM-pipeline tables (VERDICT r6 #1).

    Same oracle as pipeline_manifest_incremental: green proves
    envelope-ingested == batch-built row equivalence and at-least-once
    duplicate tolerance THROUGH the composed run, consumer unchanged
    (kept_docs_from). The cascade half of the same run is audited
    per-row by pipeline_ingest_audit."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )

    t = pipeline_tables(spark, sf_dir)
    g = ingested_index_tables(spark, sf_dir)
    corp = ~F.col("is_new")
    bands = (
        spark.read.parquet(t["doc_bands"])
        .filter(corp)
        .unionByName(spark.read.parquet(g["doc_bands"]))
    )
    qual = (
        spark.read.parquet(t["doc_quality"])
        .filter(corp)
        .unionByName(spark.read.parquet(g["doc_quality"]))
    )
    surv = spark.read.parquet(t["corpus_survivors"])
    return manifest_rows(kept_docs_from(bands, qual, surv))


@query(
    "pipeline_ingest_audit",
    f"""
SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars_stored
FROM documents WHERE source IN {_NEW_SRC_SQL}
ORDER BY doc_id
""",
)
def pipeline_ingest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row audit of the CASCADE half of the composed service run:
    the analytics table written by the same checkpointed run that
    maintained the index (plans/materialize.ingested_index_tables) must
    hold exactly one row per batch document — message_id round-trips the
    doc_id, the subject's routing segment round-trips the source, and
    the stored message_text is character-identical to the corpus text
    (length-checked here; the oracle recomputes from the source
    documents view). Exactly-once is implicit: the build bakes a
    replayed epoch into the run, so a non-idempotent cascade would
    double these rows and fail the row-count gate. Read path: one
    narrow projection of the analytics table — the MV chain's output is
    queried, never recomputed."""
    import os as _os

    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import ANALYTICS_TABLE

    t = ingested_index_tables(spark, sf_dir)
    ana = spark.read.parquet(_os.path.join(t["warehouse"], ANALYTICS_TABLE))
    return (
        # the composed stream is mixed-payload; audit the DOCUMENT
        # streams (subject segment 2 = corpus source — the embedding
        # messages ride their own 'embeddings' stream, audited through
        # the ANN recall row instead)
        ana.filter(F.col("project_code").isin(*NEW_SOURCES))
        .select(
            F.col("message_id").cast("long").alias("doc_id"),
            F.col("project_code").alias("source"),
            F.length("message_text").cast("long").alias("n_chars_stored"),
        )
        .orderBy("doc_id")
    )


def _kept_cte_erased() -> str:
    """The two-generation kept CTE over documents that were NEVER
    INGESTED per the erase set: every ``FROM documents`` reference in
    the shared prefix is wrapped with the erase filter, so the oracle
    recomputes the whole chain (shingles, signatures, bands, survivors,
    quality) from a world in which the erased docs do not exist — the
    strongest definition of erasure, which erase_docs must reproduce by
    index surgery alone (including resurrecting near-dups an erased
    survivor had suppressed)."""
    return _kept_cte().replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE doc_id % {ERASE_MOD} <> 0)",
    )


@query("pipeline_manifest_erased", _kept_cte_erased() + _manifest_tail_sql("manifest-e:"))
def pipeline_manifest_erased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training manifest AFTER a GDPR erasure (VERDICT r6 #4): the
    published pipeline tables were copied and every
    ``doc_id % ERASE_MOD == 0`` document erased through
    plans/materialize.erase_docs — filter-out rewrites of the
    signature/band/quality tables, pair-graph surgery on corpus_pairs,
    and an O(pairs) survivor recomputation that RESURRECTS docs an
    erased survivor had suppressed (at sf0.1 the erase set includes a
    3-node component's min, so the remaining members re-resolve among
    themselves). This query is the UNCHANGED manifest consumer over the
    erased tables; the oracle recomputes from scratch over
    documents-that-were-never-ingested. Green = index surgery ==
    never-saw, the equivalence a right-to-be-forgotten pipeline owes.
    Reference anchor: ALTER TABLE ... DELETE mutations (init.sql's
    MergeTree tables; plans/layout.erase_keys mirrors the part-rewrite
    for events)."""
    from go_nats_to_clickhouse_spark.plans.materialize import erased_tables

    t = erased_tables(spark, sf_dir)
    return manifest_rows(
        kept_docs_from(
            spark.read.parquet(t["doc_bands"]),
            spark.read.parquet(t["doc_quality"]),
            spark.read.parquet(t["corpus_survivors"]),
        ),
        salt="manifest-e:",
    )


@query("pipeline_dataset_card_erased", _kept_cte_erased() + _CARD_TAIL_SQL)
def pipeline_dataset_card_erased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card after the GDPR erasure — erasure composes
    across read-path consumers exactly as promotion does (the day-3
    pattern): same _dataset_card finalizer, erased-tables keep-set. The
    card's documents join needs no filter of its own: the keep-set
    already contains no erased ids, so the metadata join touches only
    surviving docs — which is itself part of the contract (no erased
    doc's metadata reaches any deliverable)."""
    from go_nats_to_clickhouse_spark.plans.materialize import erased_tables

    t = erased_tables(spark, sf_dir)
    kept = kept_docs_from(
        spark.read.parquet(t["doc_bands"]),
        spark.read.parquet(t["doc_quality"]),
        spark.read.parquet(t["corpus_survivors"]),
    )
    return _dataset_card(spark, sf_dir, kept)


@query(
    "pipeline_manifest_ingested_erased",
    _kept_cte_erased() + _manifest_tail_sql("manifest-e:"),
)
def pipeline_manifest_ingested_erased(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ingest x erase composition cell: the training manifest after
    a GDPR erasure where the BATCH half of the index was maintained by
    the LIVE COMPOSED SERVICE (pipeline_manifest_ingested's checkpointed
    run, crash-replayed epoch included), not by a batch build. The
    corpus half comes from plans/materialize.erased_tables (pair-graph
    surgery + survivor replay, as in pipeline_manifest_erased); the
    service-written batch rows get their own filter-out rewrite in
    plans/materialize.erased_ingested_tables — no replay needed on that
    side, because batch survival is computed at read time from the band
    index, so erased batch docs simply vanish from the candidate join.

    Same oracle (and salt) as pipeline_manifest_erased: green proves
    index surgery == never-ingested holds ACROSS maintenance paths —
    the right-to-be-forgotten story does not depend on how the index
    rows were produced. Consumer unchanged (kept_docs_from)."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        erased_ingested_tables,
        erased_tables,
    )

    t = erased_tables(spark, sf_dir)
    g = erased_ingested_tables(spark, sf_dir)
    corp = ~F.col("is_new")
    bands = (
        spark.read.parquet(t["doc_bands"])
        .filter(corp)
        .unionByName(spark.read.parquet(g["doc_bands"]))
    )
    qual = (
        spark.read.parquet(t["doc_quality"])
        .filter(corp)
        .unionByName(spark.read.parquet(g["doc_quality"]))
    )
    surv = spark.read.parquet(t["corpus_survivors"])
    return manifest_rows(kept_docs_from(bands, qual, surv), salt="manifest-e:")


@query(
    "pipeline_manifest_erased_live",
    _kept_cte_erased() + _manifest_tail_sql("manifest-e:"),
)
def pipeline_manifest_erased_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Erase-UNDER-streaming (VERDICT r7 #6): the training manifest where
    the GDPR erase ran WHILE the composed service was live —
    plans/materialize.erased_live_tables interleaves the staged
    rename-aside index rewrite between two micro-batches of one
    checkpointed run, and the post-erase batches append against the
    repaired tables (the MergeTree mutations-concurrent-with-inserts
    model, init.sql:17). Same oracle (and salt) as
    pipeline_manifest_erased / pipeline_manifest_ingested_erased: green
    proves index surgery == never-ingested holds even when the surgery
    and the ingest share a running service — the last composition cell
    of the lifecycle matrix (build x append x promote x erase x live).
    Consumer unchanged (kept_docs_from); corpus half from
    plans/materialize.erased_tables as in the stop-then-erase cell."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        erased_live_tables,
        erased_tables,
    )

    t = erased_tables(spark, sf_dir)
    g = erased_live_tables(spark, sf_dir)
    corp = ~F.col("is_new")
    bands = (
        spark.read.parquet(t["doc_bands"])
        .filter(corp)
        .unionByName(spark.read.parquet(g["doc_bands"]))
    )
    qual = (
        spark.read.parquet(t["doc_quality"])
        .filter(corp)
        .unionByName(spark.read.parquet(g["doc_quality"]))
    )
    surv = spark.read.parquet(t["corpus_survivors"])
    return manifest_rows(kept_docs_from(bands, qual, surv), salt="manifest-e:")


@query(
    "pipeline_service_health",
    f"""
WITH d AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
  WHERE source IN {_NEW_SRC_SQL}
),
v AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings WHERE vec_id % 4 = 3
)
SELECT family, rows_in, rows_out FROM (
  SELECT 'ann' AS family, v.n AS rows_in, v.n AS rows_out FROM v
  UNION ALL
  SELECT 'cascade', d.n + v.n, d.n + v.n FROM d, v
  UNION ALL
  SELECT 'doc_index', d.n, d.n FROM d
) ORDER BY family
""",
)
def pipeline_service_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops observability over the composed service (VERDICT r7 #7): the
    per-batch ``service_health`` rows the live run appended — batch id,
    sink family, rows presented and rows appended, plus the ANN
    drift-guard ratio — aggregated per family. The queryable analog of
    the reference's per-insert slog banner (main.go:169-171) and of
    ClickHouse's system tables: an operator watches THIS table for
    SLO-style invariants (rows_in == rows_out per family, drift near 1).
    The oracle recomputes the totals from the source fixtures: every
    day-2 batch doc and every held-out-quarter embedding flowed through
    the cascade exactly once (the exactly-once contract), the doc half
    fed the doc-index maintainer, the vec half the ANN maintainer — so
    SUM(rows_in) == SUM(rows_out) == the fixture counts, per family.
    The deliberately crash-replayed epoch of the ingested build is
    applied OUTSIDE the service run (direct apply_cascade) and so
    appears in no health row — health records what the service did, not
    what the build baked around it. Read path: one narrow aggregate of
    the small health table."""
    import os as _os

    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import HEALTH_TABLE

    t = ingested_index_tables(spark, sf_dir)
    h = spark.read.parquet(_os.path.join(t["warehouse"], HEALTH_TABLE))
    return (
        h.groupBy("family")
        .agg(
            F.sum("rows_in").cast("long").alias("rows_in"),
            F.sum("rows_out").cast("long").alias("rows_out"),
        )
        .orderBy("family")
    )


@query("pipeline_manifest_day3", _day3_kept_cte() + _manifest_tail_sql("manifest-3:"))
def pipeline_manifest_day3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-3 training manifest against a PROMOTED corpus — the cross-day
    continuity the reference's always-on MVs imply (init.sql:100-121):
    plans/materialize.gen3_tables builds a day-1 corpus excluding the
    held-out day-3 sources, folds the day-2 batch in with promote_batch
    (append the batch's signature-dedup survivors, flip is_new, compact),
    then appends the day-3 batch via append_batch_index. This query is
    the UNCHANGED read-path consumer over those tables — day 3 runs
    exactly as day 2 did, which is the whole point of promotion.

    The oracle recomputes the two-generation dedup chain from the source
    documents view (exact day-1 survivors -> signature-promoted day-2 ->
    signature-resolved day-3), so a green row proves the promoted tables
    carry the semantics the promotion op claims. Scale shape: promotion
    is an O(corpus-index) compaction at ingest time; the day-3 query
    itself stays O(batch + index scan), no text rescans."""
    from go_nats_to_clickhouse_spark.plans.materialize import gen3_tables

    t = gen3_tables(spark, sf_dir)
    return manifest_rows(
        kept_docs_from(
            spark.read.parquet(t["doc_bands"]),
            spark.read.parquet(t["doc_quality"]),
            spark.read.parquet(t["corpus_survivors"]),
        ),
        salt="manifest-3:",
    )


@query(
    "pipeline_manifest_promoted_live",
    _day3_kept_cte() + _manifest_tail_sql("manifest-3l:"),
)
def pipeline_manifest_promoted_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The day-3 manifest where the day-2 -> corpus PROMOTION ran
    BETWEEN MICRO-BATCHES of the live composed service
    (plans/materialize.promoted_live_tables) — the last lifecycle x
    streaming matrix cell (erase-live: r8; compact-live: r8): day 2
    streamed in, the fold executed against the running maintainer's
    tables, day 3 streamed in on top through the same checkpointed
    query. Same two-generation oracle as pipeline_manifest_day3 (modulo
    the manifest salt), so a green row proves streamed-then-promoted ==
    batch-promoted end-to-end through the actual micro-batch machinery,
    consumer unchanged (kept_docs_from)."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        promoted_live_tables,
    )

    t = promoted_live_tables(spark, sf_dir)
    return manifest_rows(
        kept_docs_from(
            spark.read.parquet(t["doc_bands"]),
            spark.read.parquet(t["doc_quality"]),
            spark.read.parquet(t["corpus_survivors"]),
        ),
        salt="manifest-3l:",
    )


def _provenance_oracle() -> str:
    """Per-document dedup provenance over the day-2 layout: the shared
    kept-CTE chain already computes every decision; this appends the
    suppressor ATTRIBUTION (which doc a dropped doc lost to) and emits
    one row per document."""
    return (
        _kept_cte()
        + f""",
xmatch AS (
  SELECT x.new_id, MIN(x.corpus_id) AS supp FROM (
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
    FROM bands n
    JOIN bands c ON c.band = n.band AND c.bucket = n.bucket
    WHERE n.doc_id IN (SELECT doc_id FROM new_ids)
      AND c.doc_id IN (SELECT doc_id FROM corp_surv)
  ) x
  JOIN sig sa ON sa.doc_id = x.new_id
  JOIN sig sb ON sb.doc_id = x.corpus_id
  WHERE {_EST_MATCH_SQL}
  GROUP BY x.new_id
),
prov AS (
  SELECT d.doc_id, 'corpus' AS generation,
         CASE WHEN cs.doc_id IS NOT NULL THEN 'kept'
              ELSE 'suppressed' END AS status,
         CASE WHEN cs.doc_id IS NULL THEN cc.component END AS suppressed_by
  FROM corp_ids d
  LEFT JOIN corp_surv cs ON cs.doc_id = d.doc_id
  LEFT JOIN ccomp cc ON cc.doc_id = d.doc_id
  UNION ALL
  SELECT n.doc_id, 'batch',
         CASE WHEN x.new_id IS NOT NULL THEN 'corpus_dup'
              WHEN s.doc_id IS NOT NULL THEN 'kept'
              ELSE 'batch_dup' END,
         CASE WHEN x.new_id IS NOT NULL THEN x.supp
              WHEN s.doc_id IS NULL THEN wc.component END
  FROM new_ids n
  LEFT JOIN xmatch x ON x.new_id = n.doc_id
  LEFT JOIN surv s ON s.doc_id = n.doc_id
  LEFT JOIN wcomp wc ON wc.doc_id = n.doc_id
)
SELECT p.doc_id, p.generation, p.status,
       CAST(p.suppressed_by AS BIGINT) AS suppressed_by,
       (g.doc_id IS NOT NULL) AS gopher_pass,
       (p.status = 'kept' AND g.doc_id IS NOT NULL) AS in_manifest
FROM prov p LEFT JOIN gpass g ON g.doc_id = p.doc_id
ORDER BY p.doc_id
"""
    )


@query("pipeline_dedup_provenance", _provenance_oracle())
def pipeline_dedup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dedup PROVENANCE — the explainability surface a
    training-data pipeline owes its users ("why is my document not in
    the training set?"): one row per document with its generation,
    dedup status (kept / suppressed within the corpus / dropped as a
    dup of a corpus survivor / dropped within the batch), the document
    it LOST to (component min for graph suppressions, the minimum
    colliding corpus survivor for batch-vs-corpus drops — deterministic
    attribution), the Gopher bit, and final manifest membership.

    Scale shape: pure read-path — the corpus side is the persisted pair
    graph (collision-sized) re-labeled by one CC pass plus three narrow
    index scans; the batch side is the same broadcast bucket join the
    manifest uses, with a min-aggregate for attribution instead of a
    distinct. No text ever scanned. At 100 TB this materializes as a
    provenance TABLE at ingest; here it is the query form so the oracle
    can pin every attribution against the from-scratch chain."""
    return _provenance_from(spark, pipeline_tables(spark, sf_dir))


@query(
    "pipeline_dedup_provenance_erased",
    _provenance_oracle().replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE doc_id % {ERASE_MOD} <> 0)",
    ),
)
def pipeline_dedup_provenance_erased(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Provenance AFTER a GDPR erasure — the repaired index must still
    explain itself: the same provenance consumer over the erased tables
    has to re-attribute every resurrection and re-suppression exactly as
    a never-saw build would (an erased suppressor must vanish from every
    ``suppressed_by``, a resurrected doc must flip to kept, and a doc
    that re-resolved to a new component min must attribute to THAT min).
    Erasure, like promotion, composes across consumers — same textual
    erase-wrap construction as the manifest/card erased oracles."""
    from go_nats_to_clickhouse_spark.plans.materialize import erased_tables

    return _provenance_from(spark, erased_tables(spark, sf_dir))


def _provenance_from(spark: SparkSession, t: dict[str, str]) -> DataFrame:
    """Shared day-2-layout provenance consumer (see
    pipeline_dedup_provenance) over any published/erased table family."""
    from go_nats_to_clickhouse_spark.operators.graph import connected_components

    qual = (
        spark.read.parquet(t["doc_quality"]).dropDuplicates(["doc_id"])
    )
    bands = spark.read.parquet(t["doc_bands"])
    surv_c = (
        spark.read.parquet(t["corpus_survivors"]).dropDuplicates(["doc_id"])
    )
    pairs = (
        spark.read.parquet(t["corpus_pairs"])
        .filter(F.col("within") & (F.col("gen") == 1))
        .select("doc_a", "doc_b")
    )
    # comp is defined below from ONE connected-components run shared with
    # the batch graph (r12): the corpus within-pairs and the batch
    # within-pairs connect DISJOINT node sets (a doc belongs to exactly
    # one generation and within-edges never cross), so min-label
    # components over the unioned edge set are identical to two separate
    # runs — and the CC fixed floor (edge materialization + seed + at
    # least one verification round, ~3 jobs) is paid once, not twice.

    nb = bands.filter(F.col("is_new")).select(
        F.col("doc_id").alias("new_id"), "band", "bucket",
        F.col("sig").alias("sig_a"),
    )
    cb = (
        bands.filter(~F.col("is_new"))
        .join(surv_c, "doc_id", "left_semi")
        .select(
            F.col("doc_id").alias("corpus_id"), "band", "bucket",
            F.col("sig").alias("sig_b"),
        )
    )
    xmatch = (
        cb.join(F.broadcast(bounded(nb, "ingest micro-batch, admission-bounded")), ["band", "bucket"])
        .filter(_est_matches(F.col("sig_a"), F.col("sig_b")) >= 8)
        .groupBy("new_id")
        .agg(F.min("corpus_id").alias("supp"))
        .localCheckpoint(eager=False)
    )
    new_ids = qual.filter(F.col("is_new")).select("doc_id")
    b1 = new_ids.join(
        xmatch, new_ids["doc_id"] == xmatch["new_id"], "left_anti"
    ).localCheckpoint(eager=False)
    nb1 = nb.join(b1, nb["new_id"] == b1["doc_id"], "left_semi")
    l = nb1.select(F.col("new_id").alias("doc_a"), "band", "bucket", "sig_a")
    r = nb1.select(
        F.col("new_id").alias("doc_b"), "band", "bucket",
        F.col("sig_a").alias("sig_b"),
    )
    wpairs = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(_est_matches(F.col("sig_a"), F.col("sig_b")) >= 8)
        .select("doc_a", "doc_b")
    )
    # no extra snapshot on allcomp: connected_components' result IS the
    # loop's checkpointed label table already
    allcomp = connected_components(pairs.unionByName(wpairs), shortcut=True)
    comp = allcomp.select(F.col("node").alias("c_doc"), "component")
    wcomp = allcomp.select(
        F.col("node").alias("w_doc"), F.col("component").alias("w_component")
    )
    corpus = (
        qual.filter(~F.col("is_new"))
        .select("doc_id")
        .join(surv_c.withColumn("_s", F.lit(True)), "doc_id", "left")
        .join(comp, F.col("doc_id") == F.col("c_doc"), "left")
        .select(
            "doc_id",
            F.lit("corpus").alias("generation"),
            F.when(F.col("_s"), F.lit("kept"))
            .otherwise(F.lit("suppressed"))
            .alias("status"),
            F.when(F.col("_s").isNull(), F.col("component"))
            .cast("long")
            .alias("suppressed_by"),
        )
    )
    batch = (
        new_ids.join(xmatch, new_ids["doc_id"] == xmatch["new_id"], "left")
        .join(wcomp, F.col("doc_id") == F.col("w_doc"), "left")
        .select(
            "doc_id",
            F.lit("batch").alias("generation"),
            F.when(F.col("new_id").isNotNull(), F.lit("corpus_dup"))
            .when(
                F.col("w_component").isNull()
                | (F.col("w_component") == F.col("doc_id")),
                F.lit("kept"),
            )
            .otherwise(F.lit("batch_dup"))
            .alias("status"),
            F.when(F.col("new_id").isNotNull(), F.col("supp"))
            .when(
                F.col("w_component").isNotNull()
                & (F.col("w_component") != F.col("doc_id")),
                F.col("w_component"),
            )
            .cast("long")
            .alias("suppressed_by"),
        )
    )

    gp = qual.select("doc_id", F.col("passes_gopher").alias("gopher_pass"))
    return (
        corpus.unionByName(batch)
        .join(gp, "doc_id", "left")
        .select(
            "doc_id",
            "generation",
            "status",
            "suppressed_by",
            F.coalesce(F.col("gopher_pass"), F.lit(False)).alias(
                "gopher_pass"
            ),
            ((F.col("status") == "kept") & F.col("gopher_pass")).alias(
                "in_manifest"
            ),
        )
        .orderBy("doc_id")
    )


def _provenance_day3_oracle() -> str:
    """Three-generation provenance: the day-3 kept chain plus suppressor
    attribution per generation — gen-2 drops attribute to the minimum
    SURVIVING gen-1 collider (or their fold's component min), gen-3
    drops to the minimum surviving promoted collider."""
    return (
        _day3_kept_cte()
        + f""",
xm2 AS (
  SELECT x.new_id, MIN(x.corpus_id) AS supp FROM (
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
    FROM bands n
    JOIN bands c ON c.band = n.band AND c.bucket = n.bucket
    WHERE n.doc_id IN (SELECT doc_id FROM new_ids)
      AND c.doc_id IN (SELECT doc_id FROM corp_surv)
  ) x
  JOIN sig sa ON sa.doc_id = x.new_id
  JOIN sig sb ON sb.doc_id = x.corpus_id
  WHERE {_EST_MATCH_SQL}
  GROUP BY x.new_id
),
xm3 AS (
  SELECT x.new_id, MIN(x.corpus_id) AS supp FROM (
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
    FROM bands n
    JOIN bands c ON c.band = n.band AND c.bucket = n.bucket
    WHERE n.doc_id IN (SELECT doc_id FROM d3_ids)
      AND c.doc_id IN (SELECT doc_id FROM promoted)
  ) x
  JOIN sig sa ON sa.doc_id = x.new_id
  JOIN sig sb ON sb.doc_id = x.corpus_id
  WHERE {_EST_MATCH_SQL}
  GROUP BY x.new_id
),
prov AS (
  SELECT d.doc_id, 'gen1' AS generation,
         CASE WHEN cs.doc_id IS NOT NULL THEN 'kept'
              ELSE 'suppressed' END AS status,
         CASE WHEN cs.doc_id IS NULL THEN cc.component END AS suppressed_by
  FROM corp_ids d
  LEFT JOIN corp_surv cs ON cs.doc_id = d.doc_id
  LEFT JOIN ccomp cc ON cc.doc_id = d.doc_id
  UNION ALL
  SELECT n.doc_id, 'gen2',
         CASE WHEN x.new_id IS NOT NULL THEN 'corpus_dup'
              WHEN s.doc_id IS NOT NULL THEN 'kept'
              ELSE 'batch_dup' END,
         CASE WHEN x.new_id IS NOT NULL THEN x.supp
              WHEN s.doc_id IS NULL THEN wc.component END
  FROM new_ids n
  LEFT JOIN xm2 x ON x.new_id = n.doc_id
  LEFT JOIN surv s ON s.doc_id = n.doc_id
  LEFT JOIN wcomp wc ON wc.doc_id = n.doc_id
  UNION ALL
  SELECT n.doc_id, 'gen3',
         CASE WHEN x.new_id IS NOT NULL THEN 'corpus_dup'
              WHEN s.doc_id IS NOT NULL THEN 'kept'
              ELSE 'batch_dup' END,
         CASE WHEN x.new_id IS NOT NULL THEN x.supp
              WHEN s.doc_id IS NULL THEN wc.component END
  FROM d3_ids n
  LEFT JOIN xm3 x ON x.new_id = n.doc_id
  LEFT JOIN g3surv s ON s.doc_id = n.doc_id
  LEFT JOIN g3wcomp wc ON wc.doc_id = n.doc_id
)
SELECT p.doc_id, p.generation, p.status,
       CAST(p.suppressed_by AS BIGINT) AS suppressed_by,
       (g.doc_id IS NOT NULL) AS gopher_pass,
       (p.status = 'kept' AND g.doc_id IS NOT NULL) AS in_manifest
FROM prov p LEFT JOIN gpass g ON g.doc_id = p.doc_id
ORDER BY p.doc_id
"""
    )


@query("pipeline_dedup_provenance_day3", _provenance_day3_oracle())
def pipeline_dedup_provenance_day3(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup provenance ACROSS THE PROMOTED CORPUS — what the
    generation-labeled pair graph buys beyond erasure: after day-2 was
    folded in (promote_batch), its docs' drop decisions are frozen in
    the survivor table, but the persisted cross/within edges still
    carry WHY — so a promoted non-survivor attributes to the minimum
    gen-1 survivor it collided with (cross edges filtered to kept
    olders) or its fold's within-component min, with no text and no
    recomputed candidates. The live day-3 batch attributes through the
    same bucket join the day-3 manifest uses. One row per document
    across all three generations; every attribution hash-pinned against
    the three-generation from-scratch oracle.

    Scale shape: gen-1/gen-2 attribution is pure pair-graph relabeling
    (collision-sized); day-3 is the standard broadcast bucket join with
    a min-aggregate; `documents` contributes only the source->generation
    mapping (metadata projection, no text)."""
    from go_nats_to_clickhouse_spark.operators.graph import connected_components
    from go_nats_to_clickhouse_spark.plans.materialize import gen3_tables
    from go_nats_to_clickhouse_spark.schemas import load_table

    t = gen3_tables(spark, sf_dir)
    qual = spark.read.parquet(t["doc_quality"]).dropDuplicates(["doc_id"])
    bands = spark.read.parquet(t["doc_bands"])
    surv = (
        spark.read.parquet(t["corpus_survivors"]).dropDuplicates(["doc_id"])
    )
    pairs = spark.read.parquet(t["corpus_pairs"])
    gen_of = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(F.col("source").isin(*NEW_SOURCES), F.lit(2))
            .when(F.col("source").isin(*DAY3_SOURCES), F.lit(3))
            .otherwise(F.lit(1))
            .alias("genno"),
        )
        .localCheckpoint(eager=False)
    )
    kept_flag = surv.withColumn("_s", F.lit(True))

    # gen 1: exact-pair component relabeling. The three generations'
    # within-graphs connect DISJOINT node sets (a doc belongs to exactly
    # one generation; within-edges never cross), so ONE
    # connected-components run over the unioned edges (below, after the
    # gen-2/gen-3 edge frames are built) yields identical labels while
    # paying the CC fixed floor once instead of three times (r12).
    e1 = pairs.filter(F.col("within") & (F.col("gen") == 1)).select(
        "doc_a", "doc_b"
    )
    # gen 2: frozen fold decisions explained from the persisted edges.
    # corpus_dup attribution = min cross neighbor that was KEPT (gen-1
    # kept-ness is exactly membership in the promoted survivor table —
    # promotion only ever adds docs).
    cross2 = pairs.filter((~F.col("within")) & (F.col("gen") == 2))
    xm2 = (
        cross2.join(surv, cross2["doc_a"] == surv["doc_id"], "left_semi")
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("supp"))
        .localCheckpoint(eager=False)
    )
    g2_ids = gen_of.filter(F.col("genno") == 2).select("doc_id")
    rem2 = g2_ids.join(xm2, "doc_id", "left_anti")
    w2 = pairs.filter(F.col("within") & (F.col("gen") == 2))
    w2r = w2.join(rem2, w2["doc_a"] == rem2["doc_id"], "left_semi").join(
        rem2, w2["doc_b"] == rem2["doc_id"], "left_semi"
    )
    e2 = w2r.select("doc_a", "doc_b")
    # gen 3: the live batch, attributed through the read-path bucket join
    nb = bands.filter(F.col("is_new")).select(
        F.col("doc_id").alias("new_id"), "band", "bucket",
        F.col("sig").alias("sig_a"),
    )
    cb = (
        bands.filter(~F.col("is_new"))
        .join(surv, "doc_id", "left_semi")
        .select(
            F.col("doc_id").alias("corpus_id"), "band", "bucket",
            F.col("sig").alias("sig_b"),
        )
    )
    xm3 = (
        cb.join(F.broadcast(bounded(nb, "ingest micro-batch, admission-bounded")), ["band", "bucket"])
        .filter(_est_matches(F.col("sig_a"), F.col("sig_b")) >= 8)
        .groupBy(F.col("new_id").alias("doc_id"))
        .agg(F.min("corpus_id").alias("supp"))
        .localCheckpoint(eager=False)
    )
    g3_ids = gen_of.filter(F.col("genno") == 3).select("doc_id")
    b1 = g3_ids.join(xm3, "doc_id", "left_anti").localCheckpoint(eager=False)
    nb1 = nb.join(b1, nb["new_id"] == b1["doc_id"], "left_semi")
    l = nb1.select(F.col("new_id").alias("doc_a"), "band", "bucket", "sig_a")
    r = nb1.select(
        F.col("new_id").alias("doc_b"), "band", "bucket",
        F.col("sig_a").alias("sig_b"),
    )
    wp3 = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(_est_matches(F.col("sig_a"), F.col("sig_b")) >= 8)
        .select("doc_a", "doc_b")
    )
    allcomp = connected_components(
        e1.unionByName(e2).unionByName(wp3), shortcut=True
    ).select(F.col("node").alias("c_doc"), "component")
    comp1 = comp2 = comp3 = allcomp
    g1 = (
        gen_of.filter(F.col("genno") == 1)
        .join(kept_flag, "doc_id", "left")
        .join(comp1, F.col("doc_id") == F.col("c_doc"), "left")
        .select(
            "doc_id",
            F.lit("gen1").alias("generation"),
            F.when(F.col("_s"), F.lit("kept"))
            .otherwise(F.lit("suppressed"))
            .alias("status"),
            F.when(F.col("_s").isNull(), F.col("component"))
            .cast("long")
            .alias("suppressed_by"),
        )
    )

    g2 = (
        g2_ids.join(xm2.withColumnRenamed("supp", "x_supp"), "doc_id", "left")
        .join(kept_flag, "doc_id", "left")
        .join(comp2, F.col("doc_id") == F.col("c_doc"), "left")
        .select(
            "doc_id",
            F.lit("gen2").alias("generation"),
            F.when(F.col("x_supp").isNotNull(), F.lit("corpus_dup"))
            .when(F.col("_s"), F.lit("kept"))
            .otherwise(F.lit("batch_dup"))
            .alias("status"),
            F.when(F.col("x_supp").isNotNull(), F.col("x_supp"))
            .when(F.col("_s").isNull(), F.col("component"))
            .cast("long")
            .alias("suppressed_by"),
        )
    )

    g3 = (
        g3_ids.join(xm3.withColumnRenamed("supp", "x_supp"), "doc_id", "left")
        .join(comp3, F.col("doc_id") == F.col("c_doc"), "left")
        .select(
            "doc_id",
            F.lit("gen3").alias("generation"),
            F.when(F.col("x_supp").isNotNull(), F.lit("corpus_dup"))
            .when(
                F.col("component").isNull()
                | (F.col("component") == F.col("doc_id")),
                F.lit("kept"),
            )
            .otherwise(F.lit("batch_dup"))
            .alias("status"),
            F.when(F.col("x_supp").isNotNull(), F.col("x_supp"))
            .when(
                F.col("component").isNotNull()
                & (F.col("component") != F.col("doc_id")),
                F.col("component"),
            )
            .cast("long")
            .alias("suppressed_by"),
        )
    )

    gp = qual.select("doc_id", F.col("passes_gopher").alias("gopher_pass"))
    return (
        g1.unionByName(g2)
        .unionByName(g3)
        .join(gp, "doc_id", "left")
        .select(
            "doc_id",
            "generation",
            "status",
            "suppressed_by",
            F.coalesce(F.col("gopher_pass"), F.lit(False)).alias(
                "gopher_pass"
            ),
            ((F.col("status") == "kept") & F.col("gopher_pass")).alias(
                "in_manifest"
            ),
        )
        .orderBy("doc_id")
    )


def _day3_kept_cte_erased() -> str:
    """The three-generation kept CTE over documents that were NEVER
    INGESTED per the erase set — the erase-after-promotion ground truth:
    the whole day-1 -> promote-day-2 -> day-3 chain recomputed from a
    world without the erased docs. Same textual-wrap construction as
    _kept_cte_erased, applied to the day-3 prefix. ERASE3_MOD (not
    ERASE_MOD) so the erase set provably exercises the generational
    replay at every fixture SF — including est-generation resurrections
    at the driver's sf0.01 (see the constant's probe notes)."""
    return _day3_kept_cte().replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE doc_id % {ERASE3_MOD} <> 0)",
    )


@query(
    "pipeline_manifest_erased_day3",
    _day3_kept_cte_erased() + _manifest_tail_sql("manifest-e3:"),
)
def pipeline_manifest_erased_day3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-3 manifest after a GDPR erasure on the PROMOTED corpus —
    erase-after-promotion, the case r7's first erasure row documented as
    a limitation and the generation-labeled pair graph lifts:
    promote_batch persists every fold's est-verified edges (cross vs ALL
    corpus docs + within-batch) into corpus_pairs, so
    plans/materialize.erase_docs can REPLAY the generational survivor
    rule after removing the erased nodes — resurrecting est-near-dups an
    erased promoted survivor had suppressed, re-suppressing docs whose
    resurrected neighbor now outranks them (de-survival), and splitting
    components across fold boundaries.

    Consumer: the UNCHANGED day-3 read path over
    plans/materialize.erased_gen3_tables (gen3 family copied, every
    doc_id % ERASE3_MOD == 0 erased). Oracle: the day-3 chain recomputed
    over documents-that-were-never-ingested. Green = index surgery on a
    promoted corpus == a never-saw three-generation build — the
    right-to-be-forgotten contract held across the promotion lifecycle,
    not just day 1. Reference anchor: ALTER TABLE ... DELETE mutations
    running on a MergeTree that continuous MVs (init.sql:100-121) have
    been folding batches into."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        erased_gen3_tables,
    )

    t = erased_gen3_tables(spark, sf_dir)
    return manifest_rows(
        kept_docs_from(
            spark.read.parquet(t["doc_bands"]),
            spark.read.parquet(t["doc_quality"]),
            spark.read.parquet(t["corpus_survivors"]),
        ),
        salt="manifest-e3:",
    )


def _day4_kept_cte_erased() -> str:
    """The four-generation kept CTE over never-ingested documents — the
    N-generation erase ground truth (same wrap as the day-3 form)."""
    return _day4_kept_cte().replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE doc_id % {ERASE3_MOD} <> 0)",
    )


@query(
    "pipeline_manifest_erased_day4",
    _day4_kept_cte_erased() + _manifest_tail_sql("manifest-e4:"),
)
def pipeline_manifest_erased_day4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-4 manifest after an erasure on the TWO-PROMOTION corpus —
    the N-generation induction instance of the erase replay: if the
    generational replay is exact over {gen-1, gen-2} (the day-3 row) and
    over {gen-1, gen-2, gen-3} (this row, with all-three-generation
    repairs exercised at sf0.1), it is exact for any N — the same
    induction argument the promotion loop itself rests on. Unchanged
    day-4 consumer over plans/materialize.erased_gen4_tables; oracle =
    the four-generation chain recomputed over never-ingested
    documents."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        erased_gen4_tables,
    )

    t = erased_gen4_tables(spark, sf_dir)
    return manifest_rows(
        kept_docs_from(
            spark.read.parquet(t["doc_bands"]),
            spark.read.parquet(t["doc_quality"]),
            spark.read.parquet(t["corpus_survivors"]),
        ),
        salt="manifest-e4:",
    )


@query("pipeline_manifest_day4", _day4_kept_cte() + _manifest_tail_sql("manifest-4:"))
def pipeline_manifest_day4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-4 training manifest after TWO sequential promotions
    (VERDICT r6 #6): plans/materialize.gen4_tables runs the promotion
    LOOP — build day-1, fold day-2 (promote_batch), land day-3, fold
    day-3 (the SAME promote_batch call), land day-4 — and this is once
    more the UNCHANGED read-path consumer over the resulting tables.
    The oracle recomputes the full three-est-generation chain from the
    source documents view, so a green row is the N=3 instance of the
    induction step: promotion N times == the N-generation dedup chain,
    with no per-generation special cases anywhere in the engine. Scale
    shape unchanged: each promotion is an O(corpus-index) ingest-time
    compaction; the day-N query stays O(batch + index scan)."""
    from go_nats_to_clickhouse_spark.plans.materialize import gen4_tables

    t = gen4_tables(spark, sf_dir)
    return manifest_rows(
        kept_docs_from(
            spark.read.parquet(t["doc_bands"]),
            spark.read.parquet(t["doc_quality"]),
            spark.read.parquet(t["corpus_survivors"]),
        ),
        salt="manifest-4:",
    )


@query("pipeline_dataset_card_day3", _day3_kept_cte() + _CARD_TAIL_SQL)
def pipeline_dataset_card_day3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card for the day-3 corpus — proof that promotion
    composes: every read-path consumer, not just the manifest, runs
    unchanged over the promoted tables (same _dataset_card finalizer,
    same gen3 keep-set the day-3 manifest uses). ``n_from_batch`` now
    counts day-3 arrivals; day-2 docs folded in by promote_batch report
    as corpus. Oracle = the three-generation kept CTE + the same card
    tail as the day-2 card."""
    from go_nats_to_clickhouse_spark.plans.materialize import gen3_tables

    t = gen3_tables(spark, sf_dir)
    kept = kept_docs_from(
        spark.read.parquet(t["doc_bands"]),
        spark.read.parquet(t["doc_quality"]),
        spark.read.parquet(t["corpus_survivors"]),
    )
    return _dataset_card(spark, sf_dir, kept)


@query("pipeline_dataset_card_erased_day3", _day3_kept_cte_erased() + _CARD_TAIL_SQL)
def pipeline_dataset_card_erased_day3(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dataset card after erase-after-promotion — the full
    lifecycle-composition cell: erasure (generational replay) x
    promotion (two folds) x the card consumer, all unchanged code over
    plans/materialize.erased_gen3_tables. The card's per-(source, lang)
    mix must equal a three-generation build that never saw the erased
    docs — including the corpus-share percentages, which shift when
    est-generation docs are resurrected or de-survived by the replay
    (a manifest-only check would miss a wrong n_chars join)."""
    from go_nats_to_clickhouse_spark.plans.materialize import (
        erased_gen3_tables,
    )

    t = erased_gen3_tables(spark, sf_dir)
    kept = kept_docs_from(
        spark.read.parquet(t["doc_bands"]),
        spark.read.parquet(t["doc_quality"]),
        spark.read.parquet(t["corpus_survivors"]),
    )
    return _dataset_card(spark, sf_dir, kept)


@query(
    "dedup_lsh_pairs_read",
    f"""
WITH {_SH_CTE},
{_SIG_CTES},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  ROUND(list_sum(list_transform(range(1, 17),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0, 6)
    AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
""",
)
def dedup_lsh_pairs_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs SERVED FROM THE MATERIALIZED BAND INDEX —
    the read-path twin of dedup_minhash_lsh_pairs (which stays as the
    from-scratch variant): ONE self-equi-join of the persisted
    sig-denormalized band table on (band, bucket) both generates the
    candidates and scores the minhash-estimated Jaccard, with no shingle
    explode and no text scan anywhere in the plan. A pair colliding in k
    bands costs k identical rows into the final distinct instead of a
    pre-join DISTINCT shuffle; replayed-epoch duplicate index rows are
    absorbed by the same distinct (at-least-once read contract). At
    100 TB this is the pair feed every dedup consumer actually runs —
    bucket-sorted row groups skip non-colliding buckets on both sides.
    Same oracle as the from-scratch variant: the index must carry
    exactly the banding/signature semantics it was built with."""
    t = pipeline_tables(spark, sf_dir)
    b = spark.read.parquet(t["doc_bands"])
    l = b.select(
        F.col("doc_id").alias("doc_a"), "band", "bucket",
        F.col("sig").alias("sig_a"),
    )
    r = b.select(
        F.col("doc_id").alias("doc_b"), "band", "bucket",
        F.col("sig").alias("sig_b"),
    )
    est = F.round(
        _est_matches(F.col("sig_a"), F.col("sig_b")) / F.lit(16.0), 6
    )
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .distinct()
    )


@query(
    "dedup_index_stats",
    f"""
WITH {_SH_CTE},
{_SIG_CTES},
bsz AS (
  SELECT band, bucket, COUNT(*) AS n FROM bands GROUP BY band, bucket
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(n) AS BIGINT) AS max_bucket,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE n >= 8) AS BIGINT) AS n_hot_buckets
FROM bsz GROUP BY band ORDER BY band
""",
)
def dedup_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH index health, served from the materialized band table: per
    band, the bucket count, the largest bucket, the doc count, and how
    many buckets are at/over the hot threshold (8 — the size where a
    bucket's pair contribution goes quadratic enough to watch). This is
    the observability an operator needs BEFORE a flood guard fires at
    100 TB: skewed buckets mean degenerate shingles (boilerplate) or a
    banding misconfiguration, and the fix (re-shingle, raise bands, or
    guard) is a policy choice that should be made off numbers, not
    incident reports. Read path: one narrow index scan + a two-level
    map-side-combinable aggregate; dropDuplicates on (doc_id, band)
    keeps the stats exact under replayed-epoch appends (at-least-once
    read contract)."""
    t = pipeline_tables(spark, sf_dir)
    b = (
        spark.read.parquet(t["doc_bands"])
        .dropDuplicates(["doc_id", "band"])
        .select("band", "bucket")
    )
    sizes = b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    return (
        sizes.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("n").cast("long").alias("max_bucket"),
            F.sum("n").cast("long").alias("n_docs"),
            F.count_if(F.col("n") >= 8).cast("long").alias("n_hot_buckets"),
        )
        .select(
            F.col("band").cast("long").alias("band"),
            "n_buckets",
            "max_bucket",
            "n_docs",
            "n_hot_buckets",
        )
        .orderBy("band")
    )


@query(
    "join_skew_salted",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum((event_id % 1000) * length(event_type)) AS BIGINT)
         AS weighted_sum
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew mitigation, oracle-checked: ``event_type`` is a pathologically
    hot key (5 distinct values over the whole fact table — every value is
    a celebrity key), so both halves of operators/skew.py run against it:

    * ``salted_join`` joins the fact side to a per-type weight dimension
      on (key, salt) — the dimension is replicated n_salts ways so a hot
      key's rows land on n_salts reducers instead of one;
    * ``salted_count`` computes the per-key counts as a two-phase
      (key, salt) -> key aggregation, the groupBy shape AQE's skew
      splitting does NOT cover.

    The oracle is the plain unsalted GROUP BY: salting must be invisible
    in the result, only in the task-size distribution. (AQE skew-join
    handles runtime-detected join skew; explicit salting is for skew you
    know in advance — SURVEY §2.7 skew row.)"""
    from go_nats_to_clickhouse_spark.operators.skew import (
        salted_count,
        salted_join,
    )
    from go_nats_to_clickhouse_spark.schemas import load_table

    e = load_table(spark, sf_dir, "events").select("event_type", "event_id")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type"))
    )
    weighted = (
        salted_join(e, dim, key="event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.pmod(F.col("event_id"), F.lit(1000)) * F.col("weight"))
            .cast("long")
            .alias("weighted_sum")
        )
    )
    counts = salted_count(e, "event_type").select(
        "event_type", F.col("n").cast("long").alias("n_events")
    )
    return (
        counts.join(weighted, "event_type")
        .select("event_type", "n_events", "weighted_sum")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split — dedup clusters never straddle splits
# ---------------------------------------------------------------------------


def _leakage_split_oracle() -> str:
    """Corpus CC chain (the provenance prefix), then component-root
    split assignment: the entire near-dup cluster moves together, so
    cross-split pair counts are zero by mechanism — which the oracle
    proves independently by recomputing pairs AND assignment from
    source."""
    return f"""
WITH RECURSIVE {_SH_CTE.strip().rstrip()},
{_SIG_CTES},
corp_ids AS (SELECT doc_id FROM documents WHERE source NOT IN {_NEW_SRC_SQL}),
{_EXACT_SURV_CTES},
assign AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS root
  FROM corp_ids d LEFT JOIN ccomp c ON c.doc_id = d.doc_id
),
splits AS (
  SELECT doc_id,
         CASE WHEN root % 10 < 8 THEN 'train'
              WHEN root % 10 = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM assign
),
xsplit AS (
  SELECT sa.split, COUNT(*) AS n_cross
  FROM cpairs p
  JOIN splits sa ON sa.doc_id = p.doc_a
  JOIN splits sb ON sb.doc_id = p.doc_b
  WHERE sa.split <> sb.split
  GROUP BY sa.split
)
SELECT s.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       CAST(COALESCE(MAX(x.n_cross), 0) AS BIGINT) AS n_cross_pairs
FROM splits s
JOIN documents d ON d.doc_id = s.doc_id
LEFT JOIN xsplit x ON x.split = s.split
GROUP BY s.split ORDER BY s.split
"""


@query("pipeline_leakage_safe_split", _leakage_split_oracle())
def pipeline_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test splitting — the split step every
    training pipeline runs after dedup, done the only correct way:
    assignment by NEAR-DUP CLUSTER, never by document. A random per-doc
    split leaks eval data whenever two near-duplicates land on opposite
    sides (the contamination mode Lee 2022 'Deduplicating Training Data
    Makes Language Models Better' measures); assigning every document
    its component ROOT's split moves whole clusters together, making
    cross-split near-dup pairs zero BY MECHANISM.

    Engine path: the PERSISTED exact-verified pair graph
    (``corpus_pairs`` gen 1 — the same artifact GDPR erasure replays)
    feeds connected_components; each corpus doc takes
    ``coalesce(component, doc_id)`` as its root and the root's
    ``% 10`` bucket picks train(0-7)/val(8)/test(9) — a deterministic
    integer hash both engines compute identically. The row reports per
    split: docs, characters, and the independently-counted cross-split
    pair total, which the oracle (recomputing pairs, components, AND
    assignment from raw text via the recursive-CTE chain) pins at 0.

    Scale shape: one broadcast-size component map joined to the corpus
    (components are pair-graph-sized, not corpus-sized), one
    edge-with-assignment join for the audit — O(pairs); no shuffle
    carries text. The 80/10/10 expectation holds only in distribution
    (roots hash, sizes vary) — exactly like production splits."""
    t = pipeline_tables(spark, sf_dir)
    from go_nats_to_clickhouse_spark.operators.graph import (
        connected_components,
    )
    from go_nats_to_clickhouse_spark.plans.materialize import NEW_SOURCES
    from go_nats_to_clickhouse_spark.queries.util import load_table

    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(~F.col("source").isin(*NEW_SOURCES))
        .select("doc_id", "n_chars")
    )
    pairs = (
        spark.read.parquet(t["corpus_pairs"])
        .filter(F.col("within") & (F.col("gen") == 1))
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs, shortcut=True).select(
        F.col("node").alias("c_doc"), "component"
    )
    assign = (
        corpus.join(comp, corpus["doc_id"] == F.col("c_doc"), "left")
        .withColumn("root", F.coalesce(F.col("component"), F.col("doc_id")))
        .withColumn(
            "split",
            F.when(F.pmod("root", F.lit(10)) < 8, "train")
            .when(F.pmod("root", F.lit(10)) == 8, "val")
            .otherwise("test"),
        )
        .select("doc_id", "n_chars", "split")
        # Lazy snapshot (r12): three consumers (both endpoint joins of the
        # cross-split audit + the per-split totals) each re-expanded the
        # corpus scan and the SortMergeJoin against the component map
        # (whose LogicalRDD stats block auto-broadcast). None of them
        # reuses the join's doc_id partitioning under its own key order,
        # so checkpointing loses nothing (batch-4 criterion) and the
        # corpus is scanned once, not three times.
        .localCheckpoint(eager=False)
    )
    sa = assign.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = assign.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    cross = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy(F.col("split_a").alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cross"))
    )
    return (
        assign.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .join(cross, "split", "left")
        .select(
            "split",
            "n_docs",
            "n_chars",
            F.coalesce(F.col("n_cross"), F.lit(0))
            .cast("long")
            .alias("n_cross_pairs"),
        )
        .orderBy("split")
    )


def _leakage_split_erased_oracle() -> str:
    """The split oracle recomputed over a world in which the erased docs
    never existed — the same never-ingested wrap every erased consumer
    uses (see _kept_cte_erased)."""
    return _leakage_split_oracle().replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE doc_id % {ERASE_MOD} <> 0)",
    )


@query("pipeline_leakage_safe_split_erased", _leakage_split_erased_oracle())
def pipeline_leakage_safe_split_erased(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The leakage-safe split COMPOSED WITH GDPR ERASURE — the reason
    the split must be computed from the live pair graph, not cached:
    erasing a document can SPLIT its near-dup component (the erased doc
    was the bridge), and each fragment then takes its own new root's
    bucket — documents legitimately move between train/val/test when
    their cluster changes, and the only correct invariant is the one
    this row pins: zero cross-split near-dup pairs ON THE CURRENT
    (repaired) graph. Engine path: the erased family's corpus_pairs
    (post-surgery — every edge touching an erased doc dropped, the same
    artifact the manifest consumers read) through the identical
    component/assignment chain as pipeline_leakage_safe_split; the
    oracle recomputes pairs, components, and assignment from a world
    where the erased docs never existed. Green on BOTH split rows
    proves the splitter is a plain consumer of the lifecycle like the
    manifest: erase the index, and the split follows with no special
    cases."""
    from go_nats_to_clickhouse_spark.operators.graph import (
        connected_components,
    )
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ERASE_MOD,
        NEW_SOURCES,
        erased_tables,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    t = erased_tables(spark, sf_dir)
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(
            ~F.col("source").isin(*NEW_SOURCES)
            & (F.pmod(F.col("doc_id"), F.lit(ERASE_MOD)) != 0)
        )
        .select("doc_id", "n_chars")
    )
    pairs = (
        spark.read.parquet(t["corpus_pairs"])
        .filter(F.col("within") & (F.col("gen") == 1))
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs, shortcut=True).select(
        F.col("node").alias("c_doc"), "component"
    )
    assign = (
        corpus.join(comp, corpus["doc_id"] == F.col("c_doc"), "left")
        .withColumn("root", F.coalesce(F.col("component"), F.col("doc_id")))
        .withColumn(
            "split",
            F.when(F.pmod("root", F.lit(10)) < 8, "train")
            .when(F.pmod("root", F.lit(10)) == 8, "val")
            .otherwise("test"),
        )
        .select("doc_id", "n_chars", "split")
        # Lazy snapshot (r12): three consumers (both endpoint joins of the
        # cross-split audit + the per-split totals) each re-expanded the
        # corpus scan and the SortMergeJoin against the component map
        # (whose LogicalRDD stats block auto-broadcast). None of them
        # reuses the join's doc_id partitioning under its own key order,
        # so checkpointing loses nothing (batch-4 criterion) and the
        # corpus is scanned once, not three times.
        .localCheckpoint(eager=False)
    )
    sa = assign.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = assign.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    cross = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy(F.col("split_a").alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cross"))
    )
    return (
        assign.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .join(cross, "split", "left")
        .select(
            "split",
            "n_docs",
            "n_chars",
            F.coalesce(F.col("n_cross"), F.lit(0))
            .cast("long")
            .alias("n_cross_pairs"),
        )
        .orderBy("split")
    )


def _leakage_split_day3_oracle() -> str:
    """Split assignment over the PROMOTED two-generation corpus: gen-1
    exact-verified edges among the day-1 corpus plus the folded batch's
    est-verified cross (vs ALL corpus docs) and within (among ALL batch
    docs) edges — exactly the edge set promote_batch persists — closed
    transitively, component-min roots, %10 buckets."""
    return f"""
WITH RECURSIVE {_SH_CTE.strip().rstrip()},
{_SIG_CTES},
new_ids AS (SELECT doc_id FROM documents WHERE source IN {_NEW_SRC_SQL}),
corp_ids AS (SELECT doc_id FROM documents
             WHERE source NOT IN {_NEW_SRC_SQL}
               AND source NOT IN {_DAY3_SRC_SQL}),
{_EXACT_SURV_CTES},
c2x AS MATERIALIZED (
  SELECT DISTINCT x.corpus_id AS doc_a, x.new_id AS doc_b FROM (
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
    FROM bands n
    JOIN bands c ON c.band = n.band AND c.bucket = n.bucket
    WHERE n.doc_id IN (SELECT doc_id FROM new_ids)
      AND c.doc_id IN (SELECT doc_id FROM corp_ids)
  ) x
  JOIN sig sa ON sa.doc_id = x.new_id
  JOIN sig sb ON sb.doc_id = x.corpus_id
  WHERE {_EST_MATCH_SQL}
),
c2w AS MATERIALIZED (
  SELECT w.doc_a, w.doc_b FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id
    WHERE a.doc_id IN (SELECT doc_id FROM new_ids)
      AND b.doc_id IN (SELECT doc_id FROM new_ids)
  ) w
  JOIN sig sa ON sa.doc_id = w.doc_a
  JOIN sig sb ON sb.doc_id = w.doc_b
  WHERE {_EST_MATCH_SQL}
),
allpairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM cpairs
  UNION SELECT doc_a, doc_b FROM c2x
  UNION SELECT doc_a, doc_b FROM c2w
),
gedges AS (
  SELECT doc_a AS u, doc_b AS v FROM allpairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM allpairs
),
gnodes AS (SELECT DISTINCT u AS node FROM gedges),
greach(node, r) AS (
  SELECT node, node FROM gnodes
  UNION
  SELECT e.u, greach.r FROM gedges e JOIN greach ON greach.node = e.v
),
gcomp AS (SELECT node AS doc_id, MIN(r) AS component FROM greach GROUP BY node),
gdomain AS (
  SELECT doc_id FROM corp_ids UNION ALL SELECT doc_id FROM new_ids
),
assign AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS root
  FROM gdomain d LEFT JOIN gcomp c ON c.doc_id = d.doc_id
),
splits AS (
  SELECT doc_id,
         CASE WHEN root % 10 < 8 THEN 'train'
              WHEN root % 10 = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM assign
),
xsplit AS (
  SELECT sa.split, COUNT(*) AS n_cross
  FROM allpairs p
  JOIN splits sa ON sa.doc_id = p.doc_a
  JOIN splits sb ON sb.doc_id = p.doc_b
  WHERE sa.split <> sb.split
  GROUP BY sa.split
)
SELECT s.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       CAST(COALESCE(MAX(x.n_cross), 0) AS BIGINT) AS n_cross_pairs
FROM splits s
JOIN documents d ON d.doc_id = s.doc_id
LEFT JOIN xsplit x ON x.split = s.split
GROUP BY s.split ORDER BY s.split
"""


@query("pipeline_leakage_safe_split_day3", _leakage_split_day3_oracle())
def pipeline_leakage_safe_split_day3(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The leakage-safe split over the PROMOTED two-generation corpus —
    split x promotion, the third cell of the split family (base /
    erased / promoted, mirroring the manifest family): after
    promote_batch folds day-2 into the corpus, the pair graph carries
    gen-1 exact edges PLUS the fold's est-verified cross and within
    edges, and a batch doc whose near-dup lives in the day-1 corpus
    must land in ITS cluster's split — a split computed per-generation
    would put them on opposite sides and leak. Engine: the gen-3
    family's corpus_pairs read WHOLE (every generation, cross and
    within — the same artifact the erase replay trusts) through the
    identical component/assignment chain; domain = the promoted corpus
    (day-1 docs + all folded day-2 docs; the suppressed ones get
    assignments too — inert but consistent, like their inert index
    rows). The oracle rebuilds the full promoted edge set from raw
    text (exact gen-1 chain + the est cross/within CTEs matching
    _batch_pair_edges' no-survivor-filter rule) and pins zero
    cross-split pairs on it. Green on all three split rows proves
    assignment follows the lifecycle's graph, not a cached one."""
    from go_nats_to_clickhouse_spark.operators.graph import (
        connected_components,
    )
    from go_nats_to_clickhouse_spark.plans.materialize import (
        DAY3_SOURCES,
        gen3_tables,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    t = gen3_tables(spark, sf_dir)
    domain = (
        load_table(spark, sf_dir, "documents")
        .filter(~F.col("source").isin(*DAY3_SOURCES))
        .select("doc_id", "n_chars")
    )
    pairs = spark.read.parquet(t["corpus_pairs"]).select("doc_a", "doc_b")
    comp = connected_components(pairs, shortcut=True).select(
        F.col("node").alias("c_doc"), "component"
    )
    assign = (
        domain.join(comp, domain["doc_id"] == F.col("c_doc"), "left")
        .withColumn("root", F.coalesce(F.col("component"), F.col("doc_id")))
        .withColumn(
            "split",
            F.when(F.pmod("root", F.lit(10)) < 8, "train")
            .when(F.pmod("root", F.lit(10)) == 8, "val")
            .otherwise("test"),
        )
        .select("doc_id", "n_chars", "split")
        # Lazy snapshot (r12): three consumers (both endpoint joins of the
        # cross-split audit + the per-split totals) each re-expanded the
        # corpus scan and the SortMergeJoin against the component map
        # (whose LogicalRDD stats block auto-broadcast). None of them
        # reuses the join's doc_id partitioning under its own key order,
        # so checkpointing loses nothing (batch-4 criterion) and the
        # corpus is scanned once, not three times.
        .localCheckpoint(eager=False)
    )
    sa = assign.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = assign.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    cross = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy(F.col("split_a").alias("split"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cross"))
    )
    return (
        assign.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .join(cross, "split", "left")
        .select(
            "split",
            "n_docs",
            "n_chars",
            F.coalesce(F.col("n_cross"), F.lit(0))
            .cast("long")
            .alias("n_cross_pairs"),
        )
        .orderBy("split")
    )


def _cluster_profile_oracle() -> str:
    """Corpus CC chain, then the duplication profile: how many clusters
    of each size, singletons counted arithmetically (a component only
    exists where edges do, so every ccomp component has size >= 2)."""
    return f"""
WITH RECURSIVE {_SH_CTE.strip().rstrip()},
{_SIG_CTES},
corp_ids AS (SELECT doc_id FROM documents WHERE source NOT IN {_NEW_SRC_SQL}),
{_EXACT_SURV_CTES},
csizes AS (SELECT component, COUNT(*) AS sz FROM ccomp GROUP BY component),
prof AS (
  SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(sz * COUNT(*) AS BIGINT) AS n_docs
  FROM csizes GROUP BY sz
  UNION ALL
  SELECT 1 AS cluster_size,
         CAST((SELECT COUNT(*) FROM corp_ids)
              - (SELECT COUNT(*) FROM ccomp) AS BIGINT) AS n_clusters,
         CAST((SELECT COUNT(*) FROM corp_ids)
              - (SELECT COUNT(*) FROM ccomp) AS BIGINT) AS n_docs
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size, n_clusters, n_docs
FROM prof ORDER BY cluster_size
"""


@query("dedup_cluster_profile", _cluster_profile_oracle())
def dedup_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DUPLICATION PROFILE — the cluster-size histogram every
    dedup paper reports (Lee 2022 figure-one style: how much of the
    corpus is duplicated, and how many times): per near-dup cluster
    size, the number of clusters and documents at that size, singletons
    included as size-1. This is the diagnostic a curation team reads
    BEFORE choosing dedup policy (a corpus whose mass sits in huge
    clusters wants aggressive removal or 1/size down-weighting; a
    long tail of pairs wants exact-dup removal only) — and the input
    to duplication-aware sampling weights.

    Engine path: components from the persisted exact-verified pair
    graph (edge-set-sized, never corpus-sized), sizes by one groupBy on
    the component label, singletons by arithmetic (corpus count minus
    noded docs — components exist only where edges do, so every labeled
    component has size >= 2). Output is histogram-sized: O(distinct
    cluster sizes) rows regardless of corpus scale. The oracle
    recomputes the whole chain from raw text via the recursive-CTE
    closure."""
    from go_nats_to_clickhouse_spark.operators.graph import (
        connected_components,
    )
    from go_nats_to_clickhouse_spark.plans.materialize import NEW_SOURCES
    from go_nats_to_clickhouse_spark.queries.util import load_table

    t = pipeline_tables(spark, sf_dir)
    # in-plan scalars (r12): the corpus count and the noded-doc count
    # were driver-side .count() actions — two extra jobs (one a full
    # documents pass) executed before the query's own job; both are
    # 1-row group-less aggregates the singleton row can crossJoin.
    corpus_cnt = (
        load_table(spark, sf_dir, "documents")
        .filter(~F.col("source").isin(*NEW_SOURCES))
        .agg(F.count(F.lit(1)).alias("n_corpus"))
    )
    pairs = (
        spark.read.parquet(t["corpus_pairs"])
        .filter(F.col("within") & (F.col("gen") == 1))
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs, shortcut=True)
    csizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("sz")
    )
    noded_cnt = comp.agg(F.count(F.lit(1)).alias("n_noded"))
    prof = csizes.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.first("sz") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    )
    singletons = (
        corpus_cnt.crossJoin(noded_cnt)
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("n_corpus") - F.col("n_noded"))
            .cast("long")
            .alias("n_clusters"),
            (F.col("n_corpus") - F.col("n_noded")).cast("long").alias("n_docs"),
        )
    )
    return prof.unionByName(singletons).orderBy("cluster_size")


def _sampling_weights_oracle() -> str:
    return f"""
WITH RECURSIVE {_SH_CTE.strip().rstrip()},
{_SIG_CTES},
corp_ids AS (SELECT doc_id FROM documents WHERE source NOT IN {_NEW_SRC_SQL}),
{_EXACT_SURV_CTES},
csizes AS (SELECT component, COUNT(*) AS sz FROM ccomp GROUP BY component),
wts AS (
  SELECT d.doc_id,
         CAST(1000000 // COALESCE(s.sz, 1) AS BIGINT) AS w_ppm
  FROM corp_ids d
  LEFT JOIN ccomp c ON c.doc_id = d.doc_id
  LEFT JOIN csizes s ON s.component = c.component
)
SELECT doc.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w.w_ppm) AS BIGINT) AS eff_docs_ppm
FROM wts w JOIN documents doc ON doc.doc_id = w.doc_id
GROUP BY doc.source ORDER BY doc.source
"""


@query("pipeline_sampling_weights", _sampling_weights_oracle())
def pipeline_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATION-AWARE SAMPLING WEIGHTS — the softer alternative to
    dropping near-dups that several curation pipelines prefer (keep
    every copy, down-weight each to 1/cluster_size so a 40-way
    duplicated boilerplate page contributes ONE document's worth of
    sampling mass; dedup_cluster_profile is the diagnostic, THIS is the
    policy applied): per corpus doc, weight = 1e6 // cluster_size in
    integer parts-per-million (floor division — identical on both
    engines for positive ints, the r5 rule), singletons at exactly 1e6.
    The row reports per source the document count and the effective
    (weighted) document mass — the number an epoch planner feeds into
    its mixing instead of the raw count.

    Engine shape: components from the persisted pair graph, sizes by
    one groupBy on the label, two broadcast-small joins (component map
    and size map are pair-graph-sized), weights computed in the row —
    no text read, no corpus-sized shuffle. The oracle recomputes the
    chain from raw text."""
    from go_nats_to_clickhouse_spark.operators.graph import (
        connected_components,
    )
    from go_nats_to_clickhouse_spark.plans.materialize import NEW_SOURCES
    from go_nats_to_clickhouse_spark.queries.util import load_table

    t = pipeline_tables(spark, sf_dir)
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(~F.col("source").isin(*NEW_SOURCES))
        .select("doc_id", "source")
    )
    pairs = (
        spark.read.parquet(t["corpus_pairs"])
        .filter(F.col("within") & (F.col("gen") == 1))
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs, shortcut=True)
    csizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    sized = comp.join(csizes, "component").select(
        F.col("node").alias("c_doc"), "sz"
    )
    return (
        corpus.join(sized, corpus["doc_id"] == F.col("c_doc"), "left")
        .withColumn(
            "w_ppm",
            F.floor(F.lit(1000000) / F.coalesce(F.col("sz"), F.lit(1)))
            .cast("long"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w_ppm").cast("long").alias("eff_docs_ppm"),
        )
        .orderBy("source")
    )
