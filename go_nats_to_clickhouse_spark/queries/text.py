"""Text-analysis + deduplication operators over ``documents`` — the
training-data-pipeline extensions (SURVEY.md §2.7 north star).

All hot-path expressions are built-in array/string functions (codegen'd,
no Python), so each scales as a map-only stage; the near-dup join is the
standard shingle-inverted-index self-join, which at 100 TB is the same
shuffle pattern MinHash-LSH banding uses (see operators/dedup.py for the
sketched variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

def _words():
    return F.split(F.col("text"), " ")

# ---------------------------------------------------------------------------
# Text statistics / quality scoring
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    """
SELECT
  doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_calc,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_words,
  ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / len(string_split(text, ' ')), 6) AS avg_word_len,
  ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' ')), 6) AS lexical_diversity
FROM documents
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(_words()).cast("bigint")
    n_distinct = F.size(F.array_distinct(_words())).cast("bigint")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(_words()),
            6,
        ).alias("avg_word_len"),
        F.round(
            F.size(F.array_distinct(_words())).cast("double") / F.size(_words()), 6
        ).alias("lexical_diversity"),
    )


#: tiny per-language stopword inventories for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "los", "las", "y", "es", "un"),
}


def _stop_count_spark(lang: str):
    arr = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return F.expr(
        f"size(filter(split(lower(text), ' '), w -> array_contains(array({arr}), w)))"
    ).cast("bigint")


def _stop_count_sql(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(string_split(lower(text), ' '), "
        f"w -> list_contains([{arr}], w))) AS BIGINT)"
    )


@query(
    "text_lang_id",
    f"""
SELECT doc_id, lang,
  {_stop_count_sql('en')} AS n_stop_en,
  {_stop_count_sql('de')} AS n_stop_de,
  {_stop_count_sql('fr')} AS n_stop_fr,
  {_stop_count_sql('es')} AS n_stop_es,
  CASE
    WHEN {_stop_count_sql('en')} >= {_stop_count_sql('de')}
     AND {_stop_count_sql('en')} >= {_stop_count_sql('fr')}
     AND {_stop_count_sql('en')} >= {_stop_count_sql('es')} THEN 'en'
    WHEN {_stop_count_sql('de')} >= {_stop_count_sql('fr')}
     AND {_stop_count_sql('de')} >= {_stop_count_sql('es')} THEN 'de'
    WHEN {_stop_count_sql('fr')} >= {_stop_count_sql('es')} THEN 'fr'
    ELSE 'es'
  END AS predicted_lang
FROM documents
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-inventory language ID (deterministic argmax with fixed
    tiebreak order en > de > fr > es)."""
    d = load_table(spark, sf_dir, "documents")
    en, de, fr, es = (_stop_count_spark(x) for x in ("en", "de", "fr", "es"))
    predicted = (
        F.when((en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de >= fr) & (de >= es), F.lit("de"))
        .when(fr >= es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return d.select(
        "doc_id",
        "lang",
        en.alias("n_stop_en"),
        de.alias("n_stop_de"),
        fr.alias("n_stop_fr"),
        es.alias("n_stop_es"),
        predicted.alias("predicted_lang"),
    )


@query(
    "text_quality_score",
    """
SELECT
  doc_id,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  ROUND(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        / length(text), 6) AS punct_ratio,
  ROUND(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        / length(text), 6) AS digit_ratio,
  (len(string_split(text, ' ')) BETWEEN 20 AND 1000
   AND length(regexp_replace(text, '[^0-9]', '', 'g')) * 5 < length(text))
    AS passes_quality
FROM documents
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punctuation/digit-ratio quality gate — the standard pretraining
    corpus filter shape."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(_words()).cast("bigint")
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,!?;:]", ""))
    digits = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    return d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        n_words.alias("n_words"),
        F.round(punct.cast("double") / F.length("text"), 6).alias("punct_ratio"),
        F.round(digits.cast("double") / F.length("text"), 6).alias("digit_ratio"),
        (
            n_words.between(20, 1000)
            & (digits * 5 < F.length("text"))
        ).alias("passes_quality"),
    )


@query(
    "text_token_count",
    """
SELECT
  doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens_re,
  CAST(list_sum(list_transform(string_split(text, ' '),
       w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens_bpe_est
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace, regex word tokens, and a BPE-ish estimate
    (ceil(len/4) per word — the usual chars/4 rule applied per token)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words()).cast("bigint").alias("n_tokens_ws"),
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .cast("bigint")
        .alias("n_tokens_re"),
        F.expr(
            "aggregate(split(text, ' '), 0L, (acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS LONG))"
        ).alias("n_tokens_bpe_est"),
    )


@query(
    "text_fingerprint",
    """
SELECT
  doc_id,
  md5(lower(trim(text))) AS fp_full,
  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp_bag_of_words
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash + an order-insensitive
    bag-of-words hash (catches shuffled near-duplicates)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp_full"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split(F.lower("text"), " ")))
            )
        ).alias("fp_bag_of_words"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    """
SELECT
  md5(lower(trim(text))) AS fp,
  MIN(doc_id) AS keep_doc_id,
  COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a content fingerprint, keep the lowest
    id. At 100 TB this is one shuffle on a well-distributed md5 key —
    no skew by construction."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "dedup_ngram_jaccard_pairs",
    """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> concat_ws(' ', string_split(text, ' ')[i],
                                 string_split(text, ' ')[i + 1],
                                 string_split(text, ' ')[i + 2]))) AS shingle
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.1
""",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by exact 3-gram Jaccard >= 0.1 via a
    shingle inverted-index self-join.

    Scale shape: explode -> shuffle on shingle -> pair-count. Hot shingles
    create join skew; the production path for 100 TB is the MinHash-LSH
    variant (operators/dedup.py) where bands bound pair generation — this
    exact version doubles as its verifier.
    """
    from go_nats_to_clickhouse_spark.operators.dedup import (
        shingle_arrays,
        word_shingles,
    )

    # r12: per-doc set sizes map-side from the shingle array (the sizes
    # groupBy exchange is gone — size(sharr) == the exploded distinct
    # count). Shingle ROWS stay on word_shingles' inline explode (a
    # Generate over the named array column re-runs the whole transform
    # below the widening repartition, see shingle_arrays' docstring);
    # both subtrees still share the one round-robin doc exchange.
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, n=3)
    sizes = shingle_arrays(d, n=3).select("doc_id", F.size("sharr").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.1)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Sketch-based dedup: MinHash-LSH and SimHash (operators/dedup.py), with
# exact DuckDB oracles via the engine-portable md5 hash.
# ---------------------------------------------------------------------------

_SH_CTE = """
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> concat_ws(' ', string_split(text, ' ')[i],
                                 string_split(text, ' ')[i + 1],
                                 string_split(text, ' ')[i + 2]))) AS shingle
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
  )
)
"""


def _mh_mins_sql(num_hashes: int = 16) -> str:
    """MIN aggregates of the universal-hash family — the same (a, b, p)
    constants the Spark operator uses (operators/dedup._uh_constants)."""
    from go_nats_to_clickhouse_spark.operators.dedup import UH_PRIME, _uh_constants

    return ",\n         ".join(
        f"MIN(({a} * base + {b}) % {UH_PRIME}) AS m{s}"
        for s, (a, b) in enumerate(_uh_constants(num_hashes))
    )


@query(
    "dedup_minhash_lsh_pairs",
    f"""
WITH {_SH_CTE},
based AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS base FROM sh
),
mh AS (
  SELECT doc_id,
         {_mh_mins_sql(16)}
  FROM based
  GROUP BY doc_id
),
sig AS (SELECT doc_id, [{", ".join(f"m{s}" for s in range(16))}] AS sig FROM mh),
bands AS (
  SELECT doc_id, band,
         md5(array_to_string(list_transform(range(1, 5),
             r -> CAST(sig[band * 4 + r] AS VARCHAR)), '-')) AS bucket
  FROM sig, UNNEST(range(4)) AS t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  ROUND(list_sum(list_transform(range(1, 17),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0, 6) AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
""",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH banding (4 bands x 4 rows): the sub-quadratic
    near-dup path. Candidates come from band-bucket collisions, never from
    an all-pairs join — bucket size, not corpus size, bounds the work."""
    from go_nats_to_clickhouse_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, num_hashes=16, bands=4, shingle_n=3)


@query(
    "text_simhash",
    """
WITH h AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS hs
  FROM documents
)
SELECT doc_id,
  array_to_string(list_transform(range(59, -1, -1), i ->
    CASE WHEN list_sum(list_transform(hs,
         x -> CASE WHEN (x >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
    THEN '1' ELSE '0' END), '') AS simhash_bits
FROM h
""",
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprints (bit string, MSB first) — near-dup by
    small Hamming distance; banding over bit chunks gives the LSH variant."""
    from go_nats_to_clickhouse_spark.operators.dedup import simhash_bits

    d = load_table(spark, sf_dir, "documents")
    return simhash_bits(d)


# ---------------------------------------------------------------------------
# Chunking (expression form + Python UDTF form, same oracle)
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
       CAST(c AS INT) AS chunk_idx,
       array_to_string(ws[c * 50 + 1 : least((c + 1) * 50, len(ws))], ' ') AS chunk_text,
       CAST(least((c + 1) * 50, len(ws)) - c * 50 AS INT) AS n_words
FROM w, UNNEST(range(CAST(ceil(len(ws) / 50.0) AS BIGINT))) AS t(c)
"""


@query("text_chunk_windows", _CHUNK_ORACLE)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 50-word chunking, expression form (production path)."""
    from go_nats_to_clickhouse_spark.operators.chunking import chunk_expr

    return chunk_expr(load_table(spark, sf_dir, "documents"), chunk_words=50)


@query("text_chunk_udtf", _CHUNK_ORACLE)
def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same chunking as a Python UDTF (lateral join) — identical results
    checked against the identical oracle; exists to cover the UDTF API
    surface and mark the expression/Python boundary."""
    from go_nats_to_clickhouse_spark.operators.chunking import chunk_udtf

    return chunk_udtf(spark, load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# The composed training-data prep pipeline — the flagship "what this engine
# is for" query: gate -> dedup -> chunk -> count, one declarative plan.
# ---------------------------------------------------------------------------

_PREP_ORACLE = """
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE len(string_split(text, ' ')) BETWEEN 20 AND 1000
    AND length(regexp_replace(text, '[^0-9]', '', 'g')) * 5 < length(text)
),
deduped AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                              ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM deduped)
SELECT doc_id,
       CAST(c AS INT) AS chunk_idx,
       array_to_string(ws[c * 50 + 1 : least((c + 1) * 50, len(ws))], ' ') AS chunk_text,
       CAST(least((c + 1) * 50, len(ws)) - c * 50 AS INT) AS n_words,
       CAST(list_sum(list_transform(ws[c * 50 + 1 : least((c + 1) * 50, len(ws))],
            x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens_est
FROM w, UNNEST(range(CAST(ceil(len(ws) / 50.0) AS BIGINT))) AS t(c)
"""


@query("training_data_prep", _PREP_ORACLE)
def training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep in ONE declarative plan: quality gate ->
    exact dedup (keep lowest doc_id per content hash) -> 50-word chunks
    -> per-chunk BPE-ish token estimate.

    Scale shape: the gate is a map-side filter on the scan; dedup is one
    shuffle on the content hash (row_number, not groupBy+join-back);
    chunking is a map-side explode. Total: ONE shuffle for the whole
    pipeline — the form a 100 TB pretraining prep job wants.
    """
    from pyspark.sql.window import Window

    from go_nats_to_clickhouse_spark.operators.chunking import chunk_expr

    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(_words()).cast("bigint")
    digits = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    gated = d.filter(n_words.between(20, 1000) & (digits * 5 < F.length("text")))
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    chunks = chunk_expr(deduped, chunk_words=50)
    return chunks.withColumn(
        "n_tokens_est",
        F.expr(
            "aggregate(split(chunk_text, ' '), 0L,"
            " (acc, x) -> acc + CAST(ceil(length(x) / 4.0) AS LONG))"
        ),
    )


@query(
    "sample_consistent_hash",
    """
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100 <
      CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 10 ELSE 5 END
""",
)
def sample_consistent_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus subsampling by consistent hashing: each document's
    md5(doc_id) bucket decides membership at a per-language rate (en 20%,
    de 10%, rest 5%).

    This is how training-data subsampling must work at scale: the
    decision is a pure function of the row (map-side filter at the scan,
    no shuffle, no RNG state), reproducible across engines, runs, and
    retries — unlike ``df.sample``, whose partition-seeded RNG changes
    with the physical plan.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "conv(substr(md5(CAST(doc_id AS STRING)), 1, 7), 16, 10)"
    ).cast("bigint") % 100
    rate = (
        F.when(F.col("lang") == "en", 20)
        .when(F.col("lang") == "de", 10)
        .otherwise(5)
    )
    return d.filter(bucket < rate).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Dedup cluster assignment (connected components) and PII scrubbing
# ---------------------------------------------------------------------------

_JACCARD_PAIRS_CTE = """
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> concat_ws(' ', string_split(text, ' ')[i],
                                 string_split(text, ' ')[i + 1],
                                 string_split(text, ' ')[i + 2]))) AS shingle
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
)
"""


@query(
    "dedup_connected_components",
    f"""
WITH RECURSIVE {_JACCARD_PAIRS_CTE},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
)
SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS component
FROM reach
GROUP BY node
""",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster assignment: exact-Jaccard >= 0.5 pairs form the
    near-dup graph; connected components (iterative min-label propagation,
    operators/graph.py) assign every involved document its cluster id
    (= min doc_id in the cluster). Downstream, `component == doc_id` picks
    the canonical survivor — the step a training pipeline runs after pair
    generation. Oracle: DuckDB recursive-CTE transitive closure.

    Pair generation here is the EXACT all-pairs shingle join — the
    verifier-grade variant (same role as dedup_ngram_jaccard_pairs),
    quadratic per hot shingle by design so the clustering itself is pinned
    against ground truth. The production pair path (banded LSH + exact
    Jaccard on candidates only) is what dedup_survivors runs."""
    from go_nats_to_clickhouse_spark.operators.dedup import (
        shingle_arrays,
        word_shingles,
    )
    from go_nats_to_clickhouse_spark.operators.graph import connected_components

    # r12: map-side set sizes (see dedup_ngram_jaccard_pairs)
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, n=3)
    sizes = shingle_arrays(d, n=3).select("doc_id", F.size("sharr").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    pairs = (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b")
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )


@query(
    "text_pii_scrub",
    """
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-' || CAST(doc_id AS VARCHAR)
                  || ' see https://example.org/d/' || CAST(doc_id AS VARCHAR),
             'https?://[A-Za-z0-9./_-]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\\+?[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed,
       (text || 'x' LIKE '%@%') AS had_email_in_body
FROM documents
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the standard pre-training scrub pass: URLs, emails,
    then phone-like digit runs replaced with typed placeholders, in that
    order (URL first so credentials-in-URL don't leak a partial match).
    Deterministic PII is appended to each document so the scrub is
    exercised on every row regardless of fixture content. Map-only
    codegen'd regexp_replace — no shuffle, scan-bound at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.col("doc_id").cast("string"),
        F.lit(" see https://example.org/d/"),
        F.col("doc_id").cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(synth, r"https?://[A-Za-z0-9./_-]+", "<URL>"),
            r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "<EMAIL>",
        ),
        r"\+?[0-9][0-9-]{6,}[0-9]",
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.concat(F.col("text"), F.lit("x")).like("%@%").alias("had_email_in_body"),
    )


@query(
    "text_vocab_top_terms",
    """
SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
)
WHERE term <> ''
GROUP BY term
ORDER BY n_occurrences DESC, term
LIMIT 50
""",
)
def text_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: corpus-wide term and document frequencies,
    top-50 — the first pass of any tokenizer/BPE training job. One
    explode + one hash aggregate; doc_freq rides the same shuffle via
    COUNT(DISTINCT doc_id) partial aggregation. The ORDER+LIMIT is a
    TakeOrderedAndProject (top-k heap), never a full sort, and the
    (n_occurrences, term) tiebreak makes the cut deterministic."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).filter(F.col("term") != "")
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("n_occurrences").desc(), "term")
        .limit(50)
    )


#: banded-LSH candidate pairs (4 bands x 4 rows over minhash-16, exactly the
#: Spark operator's constants) with exact Jaccard verified on candidates —
#: the production pair-generation shape, replicated in SQL so both engines
#: see the SAME deterministic candidate set (the LSH miss pattern is a pure
#: function of the md5-derived hashes, not randomness).
_LSH_VERIFIED_PAIRS_CTE = f"""
{_SH_CTE.strip().rstrip()},
based AS (
  SELECT doc_id, shingle,
         ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS base
  FROM sh
),
mh AS (
  SELECT doc_id,
         {{mins}}
  FROM based
  GROUP BY doc_id
),
sig AS (SELECT doc_id, [{", ".join(f"m{s}" for s in range(16))}] AS sig
        FROM mh),
bands AS (
  SELECT doc_id, band,
         md5(array_to_string(list_transform(range(1, 5),
             r -> CAST(sig[band * 4 + r] AS VARCHAR)), '-')) AS bucket
  FROM sig, UNNEST(range(4)) AS t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN based x ON x.doc_id = c.doc_a
  JOIN based y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
)
"""


@query(
    "dedup_survivors",
    f"""
WITH RECURSIVE {_LSH_VERIFIED_PAIRS_CTE.format(mins=_mh_mins_sql(16))},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
),
components AS (
  SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node
)
SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
LEFT JOIN components c ON c.doc_id = d.doc_id
WHERE c.doc_id IS NULL OR c.component = d.doc_id
ORDER BY d.doc_id
""",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's actual deliverable: the corpus AFTER near-dup
    resolution. PRODUCTION pair generation — banded-LSH candidates with
    exact Jaccard verified on candidates only (operators/dedup.py
    lsh_verified_jaccard_pairs; never an all-pairs shingle join, whose
    O(freq²) blowup on a hot shingle is exactly what kills a 100 TB run)
    -> connected components -> keep every document that either belongs to
    no duplicate cluster or IS its cluster's canonical representative
    (component == doc_id, i.e. the min id).

    Banding is the production 4 bands x 4 rows (the rows=1 recall-max
    configuration floods the verifier: at sf0.1 it admits ~157k candidate
    pairs vs 4x4's ~255, because P(collide | J) = 1-(1-J)^16 is ~0.82
    even at J=0.1). The ORACLE replicates the banding bit-for-bit (md5
    bucket keys, same universal-hash constants) + exact Jaccard on the
    candidates, so both engines compute the same deterministic pair set by
    construction — recall is a quality property (pinned by
    tests/test_dedup_lsh_recall.py on the fixtures), not a correctness
    coupling. shortcut=True because an open-corpus duplicate graph has no
    diameter guarantee (drifting near-dup chains) — pointer doubling
    converges in O(log d) rounds instead of O(d).

    The left join against the component table is left to AQE: the
    component table is bounded by cluster MEMBERSHIP, which is small for a
    lightly-duplicated corpus (broadcast) but corpus-scale for a
    dup-heavy one (shuffle join) — forcing a broadcast here would OOM
    exactly when dedup matters most."""
    from go_nats_to_clickhouse_spark.operators.dedup import (
        lsh_verified_jaccard_pairs,
    )
    from go_nats_to_clickhouse_spark.operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    # max_bucket=None: the oracle CTE enumerates ALL pairs per LSH bucket,
    # so the engine must too — with the default 1024 guard, a bucket
    # exceeding it would switch Spark to star expansion and (since star
    # pairs still need exact-Jaccard >= 0.5) could diverge from the oracle
    # (ADVICE r4). The guard itself is a production knob pinned by
    # tests/test_sketch_quality.py; max observed bucket here is 4.
    pairs = lsh_verified_jaccard_pairs(
        d, threshold=0.5, bands=4, max_bucket=None
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs, shortcut=True).select(
        F.col("node").alias("c_doc"), "component"
    )
    return (
        d.join(comp, d["doc_id"] == F.col("c_doc"), "left")
        .filter(F.col("c_doc").isNull() | (F.col("component") == F.col("doc_id")))
        .select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Tokenizer-training support: BPE merge statistics.
# ---------------------------------------------------------------------------


@query(
    "text_bpe_merges",
    """
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
),
vocab AS (
  SELECT w, COUNT(*) AS f FROM words WHERE length(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(w)),
                i -> substring(w, CAST(i AS INT), 2))) AS pair, f
  FROM vocab
)
SELECT pair, CAST(SUM(f) AS BIGINT) AS merge_count
FROM pairs GROUP BY pair
ORDER BY merge_count DESC, pair LIMIT 20
""",
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training (Sennrich et al.
    2016, public description): corpus-weighted frequencies of adjacent
    character pairs within words — the statistic the merge rule
    ``argmax_pair count`` is chosen from. Top-20 candidate merges, ranked
    (count desc, pair asc — a total order, so the LIMIT is deterministic).

    Scale shape is the point: stage 1 reduces the corpus to its
    VOCABULARY (word -> frequency, map-side partial agg then one
    vocab-sized shuffle); stage 2 explodes character pairs over the
    vocabulary — O(vocab x word_len), independent of corpus size — and
    the final pair aggregate is alphabet^2-bounded. A naive per-token
    pair explode would shuffle O(corpus tokens) rows; this shape is why
    BPE training on a 100-TB corpus is feasible at all. Deviation from
    the paper kept deliberately simple: symbols are bare characters (no
    end-of-word marker), single-char words contribute nothing.

    Reference anchor: the reference has no tokenizer surface; this is a
    training-data-pipeline extension (SURVEY.md §2.7 north star).
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").cast("long").alias("merge_count"))
        .orderBy(F.col("merge_count").desc(), "pair")
        .limit(20)
    )


@query(
    "text_bpe_apply",
    """
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
),
vocab AS (
  SELECT w, COUNT(*) AS f FROM words WHERE length(w) >= 2 GROUP BY w
),
stats AS (
  SELECT pair, SUM(f) AS c FROM (
    SELECT unnest(list_transform(range(1, length(w)),
                  i -> substring(w, CAST(i AS INT), 2))) AS pair, f
    FROM vocab
  ) GROUP BY pair
),
m AS (
  SELECT pair, ROW_NUMBER() OVER (ORDER BY c DESC, pair) AS rk FROM stats
),
dw AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
appl AS (
  SELECT doc_id, w,
         replace(replace(replace(w,
           (SELECT pair FROM m WHERE rk = 1), chr(1)),
           (SELECT pair FROM m WHERE rk = 2), chr(2)),
           (SELECT pair FROM m WHERE rk = 3), chr(3)) AS t
  FROM dw
)
SELECT doc_id,
       CAST(SUM(length(w)) AS BIGINT) AS n_tokens_before,
       CAST(SUM(length(t)) AS BIGINT) AS n_tokens_after
FROM appl GROUP BY doc_id ORDER BY doc_id
""",
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the consumer of text_bpe_merges'
    statistics: apply the top-3 learned merges to every document and
    report per-doc token counts before/after (each character is one
    base token; a merged pair becomes one token, represented by a
    private single character so later merges and counts stay exact in
    both engines). Deviation from full BPE kept deliberate and
    documented: the three merges are the greedy top-3 of the FIRST
    iteration's statistics, not re-estimated between merges — this row
    pins the application machinery (the per-shard map pass a tokenizer
    runs over 100 TB), while the training loop's statistic is pinned by
    text_bpe_merges.

    Replacement semantics are the cross-engine anchor: ``replace`` is
    left-to-right non-overlapping in both Spark and DuckDB ('aaa' with
    merge 'aa' -> one merged token + 'a'), so token counts agree
    exactly — no float anywhere.

    Scale shape: the merge table is 3 rows (collected driver-side like
    centroid literals — geometry-bounded, never corpus-sized); the
    application is a map-only pass over exploded words with all three
    replaces fused into one projection; the per-doc count aggregate is
    map-side combinable."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
    vocab = (
        words.filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    stats = (
        vocab.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "f",
        )
        .groupBy("pair")
        .agg(F.sum("f").alias("c"))
    )
    merges = [
        r.pair
        for r in stats.orderBy(F.col("c").desc(), "pair").limit(3).collect()
    ]
    dw = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    t = F.col("w")
    for i, pair in enumerate(merges):
        t = F.replace(t, F.lit(pair), F.lit(chr(i + 1)))
    return (
        dw.select("doc_id", F.length("w").alias("nb"), F.length(t).alias("na"))
        .groupBy("doc_id")
        .agg(
            F.sum("nb").cast("long").alias("n_tokens_before"),
            F.sum("na").cast("long").alias("n_tokens_after"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Asymmetric containment: subset-duplicate detection.
# ---------------------------------------------------------------------------


@query(
    "dedup_containment_pairs",
    """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> concat_ws(' ', string_split(text, ' ')[i],
                                 string_split(text, ' ')[i + 1],
                                 string_split(text, ' ')[i + 2]))) AS shingle
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
  )
),
df_cap AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 64
),
sh2 AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df_cap USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS contained_doc, b.doc_id AS container_doc,
         COUNT(*) AS n_common
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT contained_doc, container_doc,
       round(CAST(n_common AS DOUBLE) / sa.n, 6) AS containment,
       round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = contained_doc
JOIN sizes sb ON sb.doc_id = container_doc
WHERE CAST(n_common AS DOUBLE) / sa.n >= 0.8
ORDER BY contained_doc, container_doc
""",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs: C(A in B) = |sh(A) n sh(B)|
    / |sh(A)| >= 0.8 — the subset-duplicate signal symmetric Jaccard
    structurally misses (a short doc fully quoted inside a long one has
    high containment but Jaccard ~ |A|/|B|, under any LSH threshold).
    Broder's original resemblance/containment pairing (public 1997
    paper); Lee et al. 2021 flag exactly these partial-overlap dups in
    pretraining corpora. Both directions are emitted independently
    (containment is not symmetric); Jaccard rides along so the output
    shows the asymmetry.

    Scale shape: inverted-index POSTING-LIST pair expansion with a
    document-frequency flood guard (df <= 64): ONE shuffle groups the
    shingle rows into per-shingle posting lists, the guard drops
    boilerplate lists (a shingle shared by k docs would generate k^2
    pairs — dropped lists are not evidence), and the ordered pairs are
    expanded MAP-SIDE from each surviving list — Sum(df^2) work bounded
    by the cap, never corpus^2, and two shuffles total where the
    equivalent self-join spelling pays four (df-count, cap join back,
    join exchange x2). Dropping hot shingles can only LOWER measured
    containment of docs that contain them (documented estimator bias,
    the price of the guard; the denominator |sh(A)| deliberately stays
    uncapped so the score never inflates). Per-doc set sizes join back
    via broadcast (doc-count-bounded narrow rows). The candidate
    generation could also ride the persisted band index
    (dedup_lsh_pairs_read) — but banding recalls high-JACCARD pairs
    only, which is precisely the blind spot containment exists to
    cover, so this operator pays for its own inverted-index pass.
    """
    from go_nats_to_clickhouse_spark.operators.dedup import (
        shingle_arrays,
        word_shingles,
    )

    # r12: per-doc set sizes map-side from the shingle array (the sizes
    # groupBy exchange is gone; size(sharr) == the exploded distinct count)
    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, n=3)
    postings = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") <= 64)  # flood guard
    )
    # ordered pairs from each posting list, map-side (list order is
    # nondeterministic but the emitted pair SET is not)
    common = (
        postings.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, a -> transform(ds,"
                    " b -> struct(a AS contained_doc, b AS container_doc))))"
                )
            ).alias("pr")
        )
        .select("pr.contained_doc", "pr.container_doc")
        .filter(F.col("contained_doc") != F.col("container_doc"))
        .groupBy("contained_doc", "container_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = shingle_arrays(d, n=3).select("doc_id", F.size("sharr").alias("n"))
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    cont = F.col("n_common").cast("double") / F.col("sa.n")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        common.join(sa, F.col("contained_doc") == F.col("sa.doc_id"))
        .join(sb, F.col("container_doc") == F.col("sb.doc_id"))
        .filter(cont >= 0.8)
        .select(
            "contained_doc",
            "container_doc",
            F.round(cont, 6).alias("containment"),
            F.round(jac, 6).alias("jaccard"),
        )
        .orderBy("contained_doc", "container_doc")
    )


# ---------------------------------------------------------------------------
# Sub-document EXACT SUBSTRING dedup — repeated n-gram span merging
# ---------------------------------------------------------------------------

from go_nats_to_clickhouse_spark.operators.dedup import GRAM_N as _RS_N

# words per gram — canonical constant lives beside the postings builder
# (operators/dedup.GRAM_N) so the inline query, the DuckDB oracle, and
# the persisted gram index always agree on the width


@query(
    "dedup_repeated_substring",
    f"""
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
""",
)
def dedup_repeated_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SUBSTRING dedup — the suffix-array pass of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed as a distributed repeated-n-gram span merge: any
    word-level 15-gram occurring in >= 2 DISTINCT documents marks
    its positions, and runs of consecutive marked positions merge into
    maximal repeated spans — exactly the substrings a suffix array
    would report at >= 15 words, found without any global suffix
    sort (which does not distribute). Complements the dedup family's
    other granularities: whole-doc (exact/MinHash), paragraph
    (dedup_paragraph_exact), and cross-doc boilerplate n-grams.

    Spark shape, and why it holds at 100 TB: gram extraction is
    in-row array math (transform over sequence + slice + array_join),
    exploding to one row per gram — the same row volume a shingle
    index pays. The engine shuffles xxhash64(gram) (8-byte keys), not
    the ~100-byte gram strings the oracle groups by — collision odds
    at 2^64 are negligible against corpus gram counts, the standard
    large-corpus trade. Cross-doc repetition is ONE map-side-
    combinable two-distinct-docs aggregate (min != max, never
    countDistinct's full dedup state); marked positions join back on
    the same 8-byte key (AQE handles boilerplate-gram skew); the
    islands window partitions BY DOCUMENT (bounded by document length,
    never a global sort). Reference scope: the reference delegates all
    text analytics to ClickHouse SQL (init.sql); this operator is part
    of the training-data extension surface (SURVEY.md north star).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.withColumn("ws", _words()).filter(F.size("ws") >= _RS_N)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("ws") - F.lit(_RS_N)),
        lambda i: F.array_join(F.slice(F.col("ws"), i + 1, F.lit(_RS_N)), " "),
    )
    g = d.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"),
             F.xxhash64("gram").alias("gk"))
    rep = (
        g.groupBy("gk")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("gk")
    )
    hits = g.join(rep, "gk").select("doc_id", "pos")
    from pyspark.sql.window import Window

    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(wd))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + F.lit(_RS_N - 1)).alias("e"),
    )
    span_words = F.col("e") - F.col("s") + 1
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.max(span_words).cast("long").alias("max_span_words"),
            F.sum(span_words).cast("long").alias("repeated_words_total"),
        )
        .orderBy("doc_id")
    )


def _repeated_spans(hits: DataFrame) -> DataFrame:
    """Merge marked gram positions into maximal repeated spans and
    aggregate per document — the tail of the persisted-index read path
    (dedup_repeated_substring_read), mirroring the inline query's tail
    expression-for-expression (equality pinned by
    tests/test_repeated_substring.py::test_read_path_equals_inline). The
    islands window partitions BY DOCUMENT (bounded by document length,
    never a global sort)."""
    from pyspark.sql.window import Window

    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(wd))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + F.lit(_RS_N - 1)).alias("e"),
    )
    span_words = F.col("e") - F.col("s") + 1
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.max(span_words).cast("long").alias("max_span_words"),
            F.sum(span_words).cast("long").alias("repeated_words_total"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_repeated_substring_read",
    # identical oracle: DuckDB recomputes from text — the read path must
    # reproduce the inline result exactly, from the index alone
    f"""
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
""",
)
def dedup_repeated_substring_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_repeated_substring answered from the PERSISTED repeated-gram
    index (plans/materialize.gram_index_tables) with ZERO text
    re-shingling — the deployment form the inline query's docstring
    promises: at 100 TB the (gk, doc_id, pos) postings and the
    repeated-key set are ingest-time artifacts (built once per corpus
    generation, like the shingle index and the tokenbf sidecars), and
    span queries touch only index rows. The read plan is postings ⋈
    repeated-keys on the 8-byte gk (no gram strings, no documents scan —
    plan-pinned in tests/test_repeated_substring.py), then the per-doc
    islands merge. Oracle recomputes from raw text, so a green row
    proves index build + read == direct computation."""
    from go_nats_to_clickhouse_spark.plans.materialize import gram_index_tables

    t = gram_index_tables(spark, sf_dir)
    g = spark.read.parquet(t["gram_postings"])
    rep = spark.read.parquet(t["gram_rep"])
    hits = g.join(rep, "gk").select("doc_id", "pos")
    return _repeated_spans(hits)
