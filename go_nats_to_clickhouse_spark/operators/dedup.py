"""Near-duplicate detection operators: MinHash + LSH banding, SimHash.

These are the sub-quadratic scale path for document dedup at 100 TB — the
exact 3-gram Jaccard self-join (queries/text.py) is their verifier at test
scale.

Design constraints honored here:
* **Engine-portable hashing.** Spark's ``hash()`` (murmur) and DuckDB's
  ``hash()`` disagree, so correctness gates would be impossible. All hashes
  derive from md5 (identical everywhere): the first 15 hex chars parsed as
  a 60-bit integer. Seeded variants hash ``shingle || '#' || seed``.
* **No UDFs.** Everything is built-in expressions (split/transform/
  aggregate/md5/conv), so signatures compute map-side inside codegen.
* **Shuffle shape.** MinHash: one groupBy(doc, seed) over exploded
  shingles, then one groupBy(doc). LSH: one groupBy(band bucket) with a
  within-bucket pair expansion — the whole point vs the all-pairs join is
  that bucket sizes, not corpus size, bound pair generation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 15 hex chars = 60 bits — fits BIGINT in every engine.
HASH_HEX_CHARS = 15


def portable_hash64(col: Column, seed: Column | None = None) -> Column:
    """md5-derived 60-bit integer hash, identical in Spark and DuckDB
    (`('0x' || substr(md5(x), 1, 15))::BIGINT`)."""
    base = col if seed is None else F.concat(col, F.lit("#"), seed.cast("string"))
    return F.conv(F.substring(F.md5(base), 1, HASH_HEX_CHARS), 16, 10).cast("long")


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document: (doc_id, shingle).

    Documents with fewer than n words produce no shingles (and therefore
    never pair — same contract as the exact-Jaccard verifier).
    """
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    parts = ", ".join(f"element_at(split({text_col}, ' '), i + {j})" for j in range(n))
    shingle_arr = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))"
    )
    return (
        df.filter(F.size(words) >= n)
        .select("doc_id", F.explode(F.array_distinct(shingle_arr)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 16) -> DataFrame:
    """(doc_id, sig: array<long>[num_hashes]) — component s is
    min over shingles of portable_hash64(shingle, seed=s)."""
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"),
        "shingle",
    )
    mh = seeded.groupBy("doc_id", "seed").agg(
        F.min(portable_hash64(F.col("shingle"), F.col("seed"))).alias("mh")
    )
    return mh.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda s: s.mh
        ).alias("sig")
    )


def lsh_candidate_pairs(sig: DataFrame, bands: int = 4, rows: int = 4) -> DataFrame:
    """Banding: hash each band of ``rows`` signature components to a bucket;
    docs sharing any (band, bucket) become candidate pairs (doc_a < doc_b).

    The bucket join is the scale lever: pair generation is quadratic only
    within a bucket, and bucket occupancy is controlled by (bands, rows)
    against the target similarity threshold (s-curve ~ (1/bands)^(1/rows)).
    """
    banded = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.concat_ws(
                "-",
                F.transform(
                    F.slice(F.col("sig"), F.col("band") * rows + 1, rows),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_estimate(sig_a: Column, sig_b: Column, num_hashes: int) -> Column:
    """Estimated Jaccard = fraction of equal signature components."""
    return (
        F.aggregate(
            F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double")
        / num_hashes
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_estimate: float = 0.0,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup candidates with estimated Jaccard.

    Output: (doc_a, doc_b, est_jaccard). Deterministic given the corpus.
    """
    rows = num_hashes // bands
    sh = word_shingles(docs, n=shingle_n)
    sig = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sig, bands, rows)
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = minhash_estimate(F.col("sig_a"), F.col("sig_b"), num_hashes)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_estimate)
    )


def simhash_bits(df: DataFrame, text_col: str = "text", bits: int = 60) -> DataFrame:
    """SimHash fingerprint as a bit string (MSB first).

    Per document: hash every word occurrence to 60 bits; each fingerprint
    bit is the sign of the +-1 vote sum across words. Emitted as a '0'/'1'
    string to stay exactly portable (no 64-bit sign pitfalls).
    """
    hashes = F.expr(
        f"transform(split({text_col}, ' '), "
        f"w -> cast(conv(substring(md5(w), 1, {HASH_HEX_CHARS}), 16, 10) AS LONG))"
    )
    with_hashes = df.select("doc_id", hashes.alias("hs"))  # md5 once per word
    bit_votes = F.expr(
        f"transform(sequence({bits - 1}, 0, -1), i -> "
        "aggregate(hs, 0, (acc, h) -> "
        "acc + CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1 ELSE -1 END))"
    )
    fp = F.concat_ws(
        "",
        F.transform(bit_votes, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0"))),
    )
    return with_hashes.select("doc_id", fp.alias("simhash_bits"))
