"""Training-data pipeline extensions, round 2: decontamination, sequence
packing, per-stratum fixed-size sampling.

These extend the LLM-pipeline surface (queries/text.py) with three
operations every large-scale pretraining pipeline runs:

* **Decontamination** — find training documents sharing word n-grams with a
  held-out evaluation split (the GPT-3/The-Pile n-gram overlap protocol).
* **Sequence packing** — assign documents to fixed-token-budget context
  windows, sharded so the packing window never becomes a global sort.
* **Per-stratum sampling** — a deterministic fixed-k "reservoir" per group,
  spelled so every engine/retry picks the identical sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.hints import bounded

from go_nats_to_clickhouse_spark.operators.dedup import word_shingles
from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table


@query(
    "dedup_decontaminate",
    """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest([array_to_string(toks[i:i+4], ' ')
                   FOR i IN range(1, len(toks) - 3)]) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    WHERE len(toks) >= 5
  )
),
train AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
test  AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
hits AS (
  SELECT tr.doc_id,
         COUNT(DISTINCT tr.shingle) AS n_contaminated_grams,
         COUNT(DISTINCT te.doc_id) AS n_test_docs
  FROM train tr JOIN test te ON tr.shingle = te.shingle
  GROUP BY tr.doc_id
)
SELECT doc_id,
       CAST(n_contaminated_grams AS BIGINT) AS n_contaminated_grams,
       CAST(n_test_docs AS BIGINT) AS n_test_docs
FROM hits
WHERE n_contaminated_grams >= 2
ORDER BY doc_id
""",
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination by exact 5-gram overlap: flag training
    documents sharing >= 2 distinct word 5-grams with the held-out split
    (here the deterministic 10% ``doc_id % 10 = 0`` slice).

    Scale shape: the eval split is small relative to the corpus (benchmarks
    are MBs, corpora are TBs), so its shingle set is **broadcast** and the
    100 TB training side streams map-side through the hash join — the
    training corpus is never shuffled. Shingling is the same codegen'd
    transform/explode as the dedup family (operators/dedup.py), no UDFs.
    """
    sh = word_shingles(load_table(spark, sf_dir, "documents"), n=5)
    train = sh.filter(F.col("doc_id") % 10 != 0)
    test = sh.filter(F.col("doc_id") % 10 == 0)
    hits = (
        train.alias("tr")
        .join(
            F.broadcast(bounded(test.select(F.col("doc_id").alias("test_doc_id"), "shingle"), "held-out benchmark shingles, curated set")),
            "shingle",
        )
        .groupBy(F.col("tr.doc_id").alias("doc_id"))
        .agg(
            F.count_distinct("shingle").alias("n_contaminated_grams"),
            F.count_distinct("test_doc_id").alias("n_test_docs"),
        )
        .filter(F.col("n_contaminated_grams") >= 2)
    )
    return hits.orderBy("doc_id")


@query(
    "text_sequence_packing",
    """
WITH sized AS (
  SELECT doc_id,
         doc_id % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT shard, doc_id, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS start_off
  FROM sized
)
SELECT shard,
       CAST(start_off // 2048 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY shard, start_off // 2048
ORDER BY shard, pack_id
""",
)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: lay documents end-to-end in a
    deterministic order and cut 2048-token context windows; a document
    belongs to the window containing its first token (the contiguous-stream
    packing used when documents may cross boundaries).

    Scale shape: the running offset is a window cumsum **partitioned by
    shard** (``doc_id % 8``) — never a global ORDER BY, which would funnel
    100 TB through one task. Production packers shard exactly like this
    (each writer packs its own shard); integer arithmetic throughout, so
    the layout is bit-identical across engines and retries.
    """
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        packed.groupBy(
            "shard", F.expr("start_off div 2048").alias("pack_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "pack_id")
    )


@query(
    "sample_per_group",
    """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
FROM ranked
WHERE rk <= 50
ORDER BY lang, rk
""",
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size deterministic sample per stratum (ClickHouse ``SAMPLE``
    per-partition analog / distributed reservoir): exactly 50 documents per
    language, chosen by md5 order so every engine, run, and retry draws the
    same sample — unlike ``df.sample`` whose output depends on partitioning.

    Scale shape: one shuffle on ``lang``; the md5 rank is computed map-side.
    Skewed strata (one language dominating a 100 TB corpus) are the known
    hazard — the fix is a two-level pre-filter (keep only rows whose md5
    falls below a per-stratum quantile estimate) before the window; at
    test SF the direct window is the honest spelling.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 50)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )
