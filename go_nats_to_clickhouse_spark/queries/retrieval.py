"""Retrieval-scoring + data-selection operators over ``documents`` —
the search/selection half of a training-data pipeline (round 7):

* ``text_bm25_topk`` — Okapi BM25 ranking of the corpus against a fixed
  probe-query set: the lexical-retrieval primitive a RAG-training or
  eval-harness pipeline runs at corpus scale.
* ``text_dsir_weights`` — DSIR-style importance weights (Xie et al.
  2023, "Data Selection for Language Models via Importance Resampling",
  public arXiv description): per-document log importance ratio between a
  target distribution and the raw corpus over hashed token features —
  the standard cheap data-selection signal for matching a pretraining
  mix to a target domain.
* ``pipeline_epoch_mix`` — temperature-scaled source mixing (the
  Gopher / LLaMA-style data-mix recipe, public papers): per-source
  sampling weights proportional to token-count^T, integer token quotas,
  and a deterministic greedy selection of documents per source.

Both follow this repo's cross-engine float discipline
(text_bigram_lm_score): every transcendental (ln) is taken on a ratio
of exact integers, micro-rounded to 1e-6 as an INTEGER immediately, and
all accumulation is integer summation — so Spark and DuckDB agree
bit-for-bit regardless of float-sum order.

Reference anchor: the reference delegates search scoring to ClickHouse
full-text primitives (hasToken / multiSearchAny family); BM25 is the
ranking layer those primitives feed in a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.hints import bounded
from pyspark.sql.window import Window

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

#: the fixed probe-query set (query_id, text). Mixes the corpus's one
#: rare term ('dup', high idf) with common terms so ranking is driven by
#: idf contrast + tf/length normalization, not degenerate uniformity.
BM25_PROBES = (
    (0, "dup merge"),
    (1, "customer order query"),
    (2, "vector hash join fast"),
    (3, "dup stream"),
)

_K1 = 1.2
_B = 0.75
_TOPK = 5
#: stage-1 salt fan-out for the per-query top-k (see scale note below)
_SALTS = 64

_PROBE_VALUES = ", ".join(f"({qid}, '{txt}')" for qid, txt in BM25_PROBES)


def _bm25_oracle() -> str:
    return f"""
WITH probes(query_id, qtext) AS (VALUES {_PROBE_VALUES}),
qterms AS (
  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
  FROM probes
),
toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
),
dl AS (SELECT doc_id, len(ws) AS dl FROM toks),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS dl_sum FROM dl),
tokx AS (
  SELECT doc_id, unnest(ws) AS term FROM toks
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tokx
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT q.query_id, f.doc_id,
         CAST(round(
           ln(1.0 + (CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5))
           * ((CAST(f.tf AS DOUBLE) * {_K1 + 1.0})
              / (CAST(f.tf AS DOUBLE)
                 + {_K1} * ({1.0 - _B} + {_B}
                    * (CAST(l.dl * s.n_docs AS DOUBLE) / CAST(s.dl_sum AS DOUBLE)))))
           * 1000000) AS BIGINT) AS q
  FROM tf f
  JOIN qterms q ON q.term = f.term
  JOIN df d ON d.term = f.term
  JOIN dl l ON l.doc_id = f.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id, SUM(q) AS score_micro
  FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score_micro,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(rank AS BIGINT) AS rank,
       doc_id,
       CAST(score_micro AS BIGINT) AS score_micro,
       round(CAST(score_micro AS DOUBLE) / 1000000.0, 6) + 0.0 AS score
FROM ranked WHERE rank <= {_TOPK}
ORDER BY query_id, rank
"""


@query("text_bm25_topk", _bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-5 per probe query (k1=1.2, b=0.75, the
    +1-inside-the-log idf so scores stay positive) — corpus statistics
    (df, N, avgdl) computed from the corpus itself, exactly as a
    retrieval index build would.

    Scale shape: ONE corpus text scan. The token explode is filtered to
    the probe-query vocabulary IMMEDIATELY (a literal isin — map-side),
    so everything downstream is candidate-sized, not corpus-sized; doc
    length is a map-side array size on the same scan (no second pass);
    df and the global (N, dl_sum) stats are term-cardinality- and
    1-row-sized broadcasts. The per-query top-k deliberately AVOIDS the
    one-reducer-per-query window shape (the ANN shortlist lesson,
    VERDICT r6): stage 1 takes top-k within (query, doc_id % _SALTS) —
    64-way parallel, and a per-salt top-k prefix provably contains
    every global top-k row — then stage 2 ranks the <= _SALTS x k
    finalists per query. Ranking compares INTEGER micro-scores (ties by
    doc_id), so rank order carries no float hazard. Portability: ln of
    exact-integer rationals, micro-rounded to int64 per (term, doc)
    contribution, integer-summed (text_bigram_lm_score discipline)."""
    d = load_table(spark, sf_dir, "documents")
    qvocab = sorted({t for _, txt in BM25_PROBES for t in txt.split(" ")})
    qterms = spark.createDataFrame(
        [(qid, t) for qid, txt in BM25_PROBES for t in set(txt.split(" "))],
        "query_id long, term string",
    )

    # lazy checkpoints: dl (16 B/doc) and tf (query-vocab-sized) are
    # each consumed by TWO downstream branches; without a materialization
    # barrier every branch re-expands to its own full corpus text scan
    # (8 scans in the naive plan — measured). One scan feeds both.
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), " "), lambda x: x != F.lit("")
        ).alias("ws"),
    )
    dl = (
        toks.select("doc_id", F.size("ws").alias("dl"))
        .localCheckpoint(eager=False)
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_sum")
    )
    tf = (
        toks.select("doc_id", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(qvocab))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    norm = F.lit(1.0 - _B) + F.lit(_B) * (
        (F.col("dl") * F.col("n_docs")).cast("double")
        / F.col("dl_sum").cast("double")
    )
    contrib = F.round(
        idf
        * (
            (F.col("tf").cast("double") * F.lit(_K1 + 1.0))
            / (F.col("tf").cast("double") + F.lit(_K1) * norm)
        )
        * 1000000,
        0,
    ).cast("long")

    scored = (
        tf.join(F.broadcast(bounded(qterms, "query term literal")), "term")
        .join(F.broadcast(bounded(df, "per-query-term DF <= |query vocab|")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", contrib.alias("q"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("q").alias("score_micro"))
    )
    # two-stage exact top-k: per-salt prefixes of the (score, doc_id)
    # total order, then the tiny finalist rank
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.col("doc_id"), F.lit(_SALTS))
    ).orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    finalists = (
        scored.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _TOPK)
        .drop("rn")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    )
    return (
        finalists.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= _TOPK)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "rank",
            "doc_id",
            "score_micro",
            (
                F.round(F.col("score_micro").cast("double") / 1000000.0, 6)
                + F.lit(0.0)
            ).alias("score"),
        )
        .orderBy("query_id", "rank")
    )


@query("text_bm25_read_topk", _bm25_oracle())
def text_bm25_read_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the MATERIALIZED INVERTED INDEX — the retrieval
    analog of vector_ann_ivf_read_topk (same architecture cell:
    ingest-time precompute, partition-pruned read): the probe terms'
    md5 buckets are computed in plain Python, so the postings scan is
    STATICALLY pruned to those bucket directories (PartitionFilters,
    plan-pinned); document length rides denormalized on each posting
    row, so scoring needs NO corpus-side join — one candidate-sized
    scan, a term-cardinality df aggregate, the 1-row stats broadcast,
    and the same salted two-stage exact top-k. Same oracle as the
    inline text_bm25_topk: green proves index build == from-scratch
    scoring. At 100 TB the daily query cost is O(probe postings), not
    O(corpus)."""
    import hashlib

    from go_nats_to_clickhouse_spark.plans.materialize import (
        BM25_BUCKETS,
        bm25_tables,
    )

    t = bm25_tables(spark, sf_dir)
    qvocab = sorted({w for _, txt in BM25_PROBES for w in txt.split(" ")})
    buckets = sorted(
        {
            int(hashlib.md5(w.encode()).hexdigest()[:7], 16) % BM25_BUCKETS
            for w in qvocab
        }
    )
    qterms = spark.createDataFrame(
        [(qid, w) for qid, txt in BM25_PROBES for w in set(txt.split(" "))],
        "query_id long, term string",
    )

    # no checkpoint here (unlike the inline row's dl/tf): both consuming
    # branches re-expand to a PRUNED candidate-sized scan, which is
    # cheaper than materializing and keeps PartitionFilters visible
    posts = (
        spark.read.parquet(t["bm25_postings"])
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(qvocab))
    )
    stats = spark.read.parquet(t["bm25_stats"])
    df = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    norm = F.lit(1.0 - _B) + F.lit(_B) * (
        (F.col("dl") * F.col("n_docs")).cast("double")
        / F.col("dl_sum").cast("double")
    )
    contrib = F.round(
        idf
        * (
            (F.col("tf").cast("double") * F.lit(_K1 + 1.0))
            / (F.col("tf").cast("double") + F.lit(_K1) * norm)
        )
        * 1000000,
        0,
    ).cast("long")

    scored = (
        posts.join(F.broadcast(bounded(qterms, "query term literal")), "term")
        .join(F.broadcast(bounded(df, "per-query-term DF <= |query vocab|")), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", contrib.alias("q"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("q").alias("score_micro"))
    )
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.col("doc_id"), F.lit(_SALTS))
    ).orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    finalists = (
        scored.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _TOPK)
        .drop("rn")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    )
    return (
        finalists.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= _TOPK)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "rank",
            "doc_id",
            "score_micro",
            (
                F.round(F.col("score_micro").cast("double") / 1000000.0, 6)
                + F.lit(0.0)
            ).alias("score"),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

#: hashed-feature bucket count (DSIR uses hashed n-grams; buckets keep
#: the "model" bounded and broadcastable at any corpus size)
_DSIR_BUCKETS = 256
#: the target distribution: English documents (the "domain" the raw
#: corpus is being importance-matched to)
_DSIR_TARGET_LANG = "en"


def _dsir_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS term
  FROM documents
),
b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(term), 1, 7)) AS BIGINT)
           % {_DSIR_BUCKETS} AS bucket
  FROM toks
),
cnt AS (
  SELECT bucket,
         COUNT(*) FILTER (WHERE lang = '{_DSIR_TARGET_LANG}') AS ct,
         COUNT(*) AS cr
  FROM b GROUP BY bucket
),
tot AS (
  SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt
),
ratio AS (
  SELECT bucket,
         CAST(round(
           ln((CAST(ct AS DOUBLE) + 1.0) * (CAST(tr AS DOUBLE) + {_DSIR_BUCKETS}.0)
              / ((CAST(cr AS DOUBLE) + 1.0) * (CAST(tt AS DOUBLE) + {_DSIR_BUCKETS}.0)))
           * 1000000) AS BIGINT) AS q
  FROM cnt CROSS JOIN tot
),
dc AS (
  SELECT doc_id, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2
),
agg AS (
  SELECT d.doc_id,
         CAST(SUM(d.c) AS BIGINT) AS n,
         CAST(SUM(r.q * d.c) AS BIGINT) AS s
  FROM dc d JOIN ratio r ON r.bucket = d.bucket
  GROUP BY d.doc_id
),
avgd AS (
  -- integer half-away-from-zero rounding of s/n (see the query
  -- docstring: float round() is engine-divergent on half boundaries)
  SELECT doc_id, n, s,
         (CASE WHEN s < 0 THEN -1 ELSE 1 END)
         * (abs(s) // n
            + CASE WHEN 2 * (abs(s) - (abs(s) // n) * n) >= n
                   THEN 1 ELSE 0 END) AS am
  FROM agg
)
SELECT doc_id,
       n AS n_tokens,
       s AS dsir_sum_micro,
       CAST(am AS DOUBLE) / 1000000.0 AS dsir_logratio
FROM avgd ORDER BY doc_id
"""


@query("text_dsir_weights", _dsir_oracle())
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weight per document (Xie et al. 2023):
    average log ratio ln(p_target / p_raw) over hashed token features,
    where p_target is estimated from the English subset and p_raw from
    the whole corpus, each with Laplace smoothing over _DSIR_BUCKETS
    hash buckets. Documents whose feature mix looks like the target get
    positive weights — the resampling key for matching a 100-TB crawl
    to a target domain mix.

    Scale shape: one text scan feeds ONE explode; the bucket id is a
    map-side md5 (engine-portable — same digest both sides, no RNG);
    the 'model' is the 256-row bucket table (two integer counts per
    bucket -> broadcast at any corpus size, like the bigram LM); the
    per-doc reduce aggregates (doc, bucket) counts so the log table is
    consulted once per distinct bucket per doc, not per token.
    Portability: ln of exact-count products, micro-rounded to int64 per
    bucket ONCE, then integer-weighted sums only. The per-doc AVERAGE is
    rounded in INTEGER arithmetic (half away from zero on the exact
    rational s/n), never with float round(): Spark's round() HALF_UPs
    the double's shortest decimal string while DuckDB rounds the binary
    value, and they disagree when s/(1e6 n) sits on a half boundary —
    measured at sf0.1 (doc 4652: -362618/92e6 -> -0.003942 vs
    -0.003941). The integer form is boundary-exact in both engines."""
    d = load_table(spark, sf_dir, "documents")
    width = spark.sparkContext.defaultParallelism
    toks = d.repartition(width).select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    b = toks.select(
        "doc_id",
        "lang",
        F.pmod(
            F.conv(F.substring(F.md5("term"), 1, 7), 16, 10).cast("long"),
            F.lit(_DSIR_BUCKETS),
        ).alias("bucket"),
    )
    # (r12 note: a lazy snapshot on dc was TRIED and reverted — it erases
    # dc's hash partitioning and re-exchanges both consumers; the runtime
    # stage reuse already shares the (doc,bucket) shuffle.)
    dc = b.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c"),
        F.count_if(F.col("lang") == _DSIR_TARGET_LANG).alias("c_tgt"),
    )
    cnt = dc.groupBy("bucket").agg(
        F.sum("c_tgt").alias("ct"), F.sum("c").alias("cr")
    )
    tot = cnt.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    q = F.round(
        F.log(
            (F.col("ct").cast("double") + F.lit(1.0))
            * (F.col("tr").cast("double") + F.lit(float(_DSIR_BUCKETS)))
            / (
                (F.col("cr").cast("double") + F.lit(1.0))
                * (F.col("tt").cast("double") + F.lit(float(_DSIR_BUCKETS)))
            )
        )
        * 1000000,
        0,
    ).cast("long")
    ratio = cnt.crossJoin(F.broadcast(tot)).select("bucket", q.alias("q"))
    agg = (
        dc.join(F.broadcast(bounded(ratio, "256-bucket feature-hash model table")), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("q") * F.col("c")).cast("long").alias("s"),
        )
    )
    return (
        agg.select("doc_id", "n", "s", _int_round_ratio("s", "n").alias("am"))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.col("s").alias("dsir_sum_micro"),
            (F.col("am").cast("double") / F.lit(1000000.0)).alias(
                "dsir_logratio"
            ),
        )
        .orderBy("doc_id")
    )


def _int_round_ratio(s: str, n: str):
    """Half-away-from-zero rounding of the exact rational ``s``/``n``
    (n > 0) in pure int64 arithmetic — the engine-portable replacement
    for ``round(s / n)`` on a double (see text_dsir_weights). ``div`` is
    integer truncation, which equals floor for the non-negative
    |s|."""
    a = F.abs(F.col(s))
    q = F.expr(f"abs({s}) div {n}")
    r = a - q * F.col(n)
    rounded = q + F.when(r * 2 >= F.col(n), F.lit(1)).otherwise(F.lit(0))
    return (
        F.when(F.col(s) < 0, F.lit(-1)).otherwise(F.lit(1)) * rounded
    ).cast("long")


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing — the epoch data-mix plan
# ---------------------------------------------------------------------------

#: epoch token budget as a fraction of the corpus (integer division)
_MIX_BUDGET_DIV = 10
_MIX_SALT = "mix-0:"


def _epoch_mix_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
              AS BIGINT) AS n_tok
  FROM documents
),
src AS (
  SELECT source, SUM(n_tok) AS n_src FROM d GROUP BY source
),
w AS (
  SELECT source, n_src,
         CAST(floor(sqrt(CAST(n_src AS DOUBLE)) * 1000000) AS BIGINT)
           AS weight_micro
  FROM src
),
tot AS (
  SELECT SUM(weight_micro) AS sw,
         (SELECT SUM(n_tok) FROM d) // {_MIX_BUDGET_DIV} AS budget
  FROM w
),
quota AS (
  SELECT source, n_src, weight_micro,
         CAST(floor(CAST(t.budget AS DOUBLE) * CAST(weight_micro AS DOUBLE)
                    / CAST(t.sw AS DOUBLE)) AS BIGINT) AS quota
  FROM w CROSS JOIN tot t
),
ordered AS (
  SELECT d.doc_id, d.source, d.n_tok,
         SUM(d.n_tok) OVER (
           PARTITION BY d.source
           ORDER BY md5('{_MIX_SALT}' || CAST(d.doc_id AS VARCHAR)), d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM d
),
sel AS (
  SELECT o.source, o.n_tok
  FROM ordered o JOIN quota q ON q.source = o.source
  WHERE o.cum - o.n_tok < q.quota
)
SELECT q.source,
       CAST(q.n_src AS BIGINT) AS n_source_tokens,
       q.weight_micro,
       q.quota,
       CAST(COUNT(s.n_tok) AS BIGINT) AS n_docs_selected,
       CAST(COALESCE(SUM(s.n_tok), 0) AS BIGINT) AS tokens_selected
FROM quota q LEFT JOIN sel s ON s.source = q.source
GROUP BY q.source, q.n_src, q.weight_micro, q.quota
ORDER BY q.source
"""


@query("pipeline_epoch_mix", _epoch_mix_oracle())
def pipeline_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing — the epoch data-mix plan of a
    Gopher/LLaMA-style pretraining run (public recipes): per-source
    sampling weight proportional to token_count^0.5, an integer token
    quota per source out of a corpus/10 epoch budget, and a
    deterministic greedy selection (docs in salted-md5 order until the
    quota boundary, boundary doc included). Returned per source:
    totals, weight, quota, and what the selection actually took — the
    table a training launcher consumes.

    Determinism/portability: T = 0.5 so the weight is ONE sqrt — IEEE
    754 requires sqrt to be correctly rounded, so both engines produce
    identical bits (no exp/ln chain); weights are floor-micro'd to
    int64 before the (order-free) integer sum; quotas floor exact-int
    doubles (exact below 2^53 — at larger scales the ±1-token quota
    wobble is operationally irrelevant but would need DECIMAL(38)
    arithmetic to stay oracle-exact); selection compares integer
    cumulative sums on md5 order. Scale shape: token counts are
    map-side array sizes; the weight/quota table is sources-sized
    (broadcast); the per-source running sum is the same
    few-huge-partitions shape as text_sequence_packing — shard within
    source on the salted order if a single source outgrows one task."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
        ).cast("long").alias("n_tok"),
    ).localCheckpoint(eager=False)
    src = d.groupBy("source").agg(F.sum("n_tok").alias("n_src"))
    w = src.select(
        "source",
        "n_src",
        F.floor(F.sqrt(F.col("n_src").cast("double")) * 1000000)
        .cast("long")
        .alias("weight_micro"),
    )
    tot = w.agg(F.sum("weight_micro").alias("sw")).crossJoin(
        d.agg(
            (F.sum("n_tok") / _MIX_BUDGET_DIV).cast("long").alias("budget")
        )
    )
    quota = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_src",
        "weight_micro",
        F.floor(
            F.col("budget").cast("double")
            * F.col("weight_micro").cast("double")
            / F.col("sw").cast("double")
        )
        .cast("long")
        .alias("quota"),
    )
    h = F.md5(F.concat(F.lit(_MIX_SALT), F.col("doc_id").cast("string")))
    cum = F.sum("n_tok").over(
        Window.partitionBy("source")
        .orderBy(h, "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = d.select("doc_id", "source", "n_tok", cum.alias("cum"))
    sel = ordered.join(F.broadcast(bounded(quota.select("source", "quota"), "one row per config-enumerated source")), "source").filter(
        F.col("cum") - F.col("n_tok") < F.col("quota")
    )
    picked = sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_selected"),
        F.sum("n_tok").alias("tokens_selected"),
    )
    return (
        quota.join(picked, "source", "left")
        .select(
            "source",
            F.col("n_src").cast("long").alias("n_source_tokens"),
            "weight_micro",
            "quota",
            F.coalesce(F.col("n_docs_selected"), F.lit(0))
            .cast("long")
            .alias("n_docs_selected"),
            F.coalesce(F.col("tokens_selected"), F.lit(0))
            .cast("long")
            .alias("tokens_selected"),
        )
        .orderBy("source")
    )
