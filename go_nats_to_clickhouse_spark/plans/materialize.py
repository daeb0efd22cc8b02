"""Ingest-time materialization of the training-data pipeline's derived
tables — the reference's MV architecture (init.sql:100-121: materialized
views precompute at INSERT time so queries read precomputed tables) applied
at pipeline scale.

Four tables are persisted per documents fixture, all of them artifacts a
production corpus store computes when a document is ingested, NOT at query
time:

* ``doc_sigs``      — (doc_id, sig array<long>[16], is_new): the minhash
  signature index. At 100 TB this is the table every dedup / similarity
  job reads instead of re-sharding corpus text; ~128 B/doc vs ~KBs of text.
* ``doc_bands``     — (doc_id, band, bucket, sig, is_new): the banded-LSH
  bucket index (4 bands x 4 rows over minhash-16 — the production banding
  the whole dedup family uses) with the signature DENORMALIZED onto every
  band row (~512 B/doc for 4 copies — the classic index-storage-for-join
  trade): a bucket collision row carries both sides' signatures, so
  candidate generation AND minhash verification happen in the one bucket
  equi-join, with no signature-table joins after it. This is the
  *persistable index* operators/dedup.incremental_lsh_pairs documents:
  per-batch candidate generation is a bucket equi-join on this table, the
  corpus never reshuffles.
* ``doc_quality``   — (doc_id, passes_gopher, is_new): the Gopher gate
  bit, computed by the same ``gopher_flags`` expression the
  ``text_gopher_rules`` query uses (shared function, not a copy).
* ``corpus_survivors`` — (doc_id): the day-1 corpus after near-dup
  resolution — banded-LSH candidates + exact-Jaccard verification +
  connected components, exactly the ``dedup_survivors`` pipeline
  restricted to the corpus split (sources other than src0/src1; src0/src1
  model the NEXT ingest batch, same split as dedup_incremental_new_batch).

Freshness: the cache key is (params version, documents.parquet size,
mtime). A fixture regeneration or a parameter change produces a new tag
directory; stale tags for the same fixture are swept. Publication is
atomic (build under a '.'-prefixed hidden dir, then one rename), so a
concurrent reader never sees a half-built table and a crashed build leaves
only hidden litter.

Scale notes: every build stage is an already-audited production shape
(word_shingles' input-split widening, single-shuffle minhash, flood-guard
candidate join, one-job-per-round CC). The build cost is ingest cost —
amortized over every downstream query, exactly like the reference's MVs.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: bump to invalidate every cached materialization (any change to the
#: signature/banding/quality/survivor definitions must bump this)
MAT_VERSION = 3

#: the ingest split: these sources model the day-2 batch (same convention
#: as queries/clickhouse_r3.dedup_incremental_new_batch)
NEW_SOURCES = ("src0", "src1")

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

TABLES = ("doc_sigs", "doc_bands", "doc_quality", "corpus_survivors")


def _mat_root() -> str:
    return os.environ.get(
        "SPARK_GRAFT_MAT_DIR",
        os.path.join(_REPO_ROOT, "spark-warehouse", "mat_pipeline"),
    )


def _fingerprint(sf_dir: str) -> str:
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    key = f"v{MAT_VERSION}:{st.st_size}:{st.st_mtime_ns}"
    return hashlib.md5(key.encode()).hexdigest()[:12]


def _tag(sf_dir: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return f"{sf_name}-{_fingerprint(sf_dir)}"


def _published(tag_prefix: str, tag: str, tables: tuple[str, ...], build_fn):
    """Shared cache/publish protocol for every materialization family:
    build under a PER-BUILD unique hidden dir ('.'-prefixed AND '='-free,
    the visibility rules plans/layout.py documents), publish with one
    atomic rename, and only THEN retire the previous generation.

    Per-build tmp dirs (tempfile.mkdtemp) make os.rename the only commit
    point even under concurrency: two racing builders each write their own
    staging dir, the loser's rename fails against the winner's published
    base and its litter is removed — no builder can ever rmtree another's
    in-progress build or keep writing into a published dir (ADVICE r5).
    Sweeping stale tags after the rename means a FAILED build leaves the
    previous valid cache intact."""
    root = _mat_root()
    base = os.path.join(root, tag)
    paths = {t: os.path.join(base, t) for t in tables}
    if os.path.isdir(base):
        return paths
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root, prefix=f".build-{tag}-")
    try:
        build_fn(tmp)
        try:
            os.rename(tmp, base)
        except OSError:
            if not os.path.isdir(base):
                raise  # real failure, not a lost publish race
    finally:
        # no-op when the rename committed; drops this build's litter on
        # any failure or lost race, never touching other builders' dirs
        shutil.rmtree(tmp, ignore_errors=True)
    # retire previous generations only after a successful publish; the
    # prefix match hits published tags only (hidden dirs are '.'-prefixed)
    for entry in os.listdir(root):
        if entry.startswith(tag_prefix) and entry != tag:
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    return paths


def pipeline_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Return {table_name: path} for the materialized pipeline tables of
    ``sf_dir``'s documents fixture, building them first if absent or stale
    (the build is a no-op on every later call — ingest-time cost, not
    query-time cost)."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return _published(
        f"{sf_name}-", _tag(sf_dir), TABLES, lambda tmp: _build(spark, sf_dir, tmp)
    )


def _build(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    from go_nats_to_clickhouse_spark.operators.dedup import (
        lsh_verified_jaccard_pairs,
    )
    from go_nats_to_clickhouse_spark.operators.graph import connected_components
    from go_nats_to_clickhouse_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("source").isin(*NEW_SOURCES)
    membership = docs.select("doc_id", is_new.alias("is_new"))

    # shared per-document index rows (see index_rows) + per-doc membership
    rows = index_rows(docs)
    sort_keys = {"doc_sigs": ("doc_id",), "doc_bands": ("band", "bucket"),
                 "doc_quality": ("doc_id",)}
    for name, df in rows.items():
        # doc_bands sorted by bucket: parquet row-group stats then give
        # data-skipping on the bucket equi-join's build side at scale
        _write(
            df.join(membership, "doc_id").sortWithinPartitions(*sort_keys[name]),
            os.path.join(out_dir, name),
        )

    # corpus survivors: the dedup_survivors pipeline on the corpus split.
    # max_bucket=None keeps the pair set definitionally identical to the
    # all-pairs-per-bucket oracle (see queries/text.dedup_survivors).
    corpus = docs.filter(~is_new)
    pairs = lsh_verified_jaccard_pairs(
        corpus, threshold=0.5, bands=4, max_bucket=None
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs, shortcut=True).select(
        F.col("node").alias("c_doc"), "component"
    )
    surv = (
        corpus.join(comp, corpus["doc_id"] == F.col("c_doc"), "left")
        .filter(F.col("c_doc").isNull() | (F.col("component") == F.col("doc_id")))
        .select("doc_id")
    )
    _write(surv.sortWithinPartitions("doc_id"), os.path.join(out_dir, "corpus_survivors"))


def _write(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def drop_cache(sf_dir: str | None = None) -> None:
    """Test hook: drop every materialized table family (pipeline AND ann)
    for one fixture, or everything."""
    root = _mat_root()
    if not os.path.isdir(root):
        return
    if sf_dir is None:
        shutil.rmtree(root, ignore_errors=True)
        return
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    prefixes = (
        f"{sf_name}-",
        f"ann-{sf_name}-",
        f".build-{sf_name}-",
        f".build-ann-{sf_name}-",
    )
    for entry in os.listdir(root):
        if entry.startswith(prefixes):
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)


# ---------------------------------------------------------------------------
# ANN index at rest: IVF centroids + cell-partitioned corpus.
# ---------------------------------------------------------------------------

ANN_TABLES = ("ann_centroids", "ann_corpus")

#: bump to invalidate cached ANN materializations
ANN_VERSION = 1


def _ann_fingerprint(sf_dir: str, n_lists: int) -> str:
    # n_lists is part of the key: a non-default n_lists must build its own
    # tag, not silently reuse an index trained with another (ADVICE r5)
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    key = f"annv{ANN_VERSION}:{n_lists}:{st.st_size}:{st.st_mtime_ns}"
    return hashlib.md5(key.encode()).hexdigest()[:12]


def ann_tables(spark: SparkSession, sf_dir: str, n_lists: int = 16) -> dict[str, str]:
    """Materialized IVF index for the embeddings fixture — the ANN analog
    of :func:`pipeline_tables` (same ingest-time-precompute architecture):

    * ``ann_centroids`` — (cell, center array<double>): the trained
      centroid table, dimension-table-sized (n_lists x dim), always
      broadcastable.
    * ``ann_corpus``    — (neighbor_id, cv array<double>) PARTITIONED BY
      ``cell``: the corpus physically clustered by its inverted list. At
      100 TB this is the layout that makes nprobe search an I/O win, not
      just a compute win — a probe of nprobe/n_lists cells reads only
      that fraction of the corpus FILES (dynamic partition pruning from
      the broadcast probe list; pinned in the read-path query's plan).

    Training is operators/similarity.ivf_build_assignments — numpy
    Lloyd's on a bounded prefix sample, deterministic for fixed seed +
    input order, so rebuilding from the same fixture reproduces the index
    bit-for-bit (and matches the inline vector_ann_ivf_topk training)."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    tag = f"ann-{sf_name}-{_ann_fingerprint(sf_dir, n_lists)}"

    def build(tmp: str) -> None:
        from go_nats_to_clickhouse_spark.operators.similarity import (
            ivf_build_assignments,
        )
        from go_nats_to_clickhouse_spark.schemas import load_table

        e = load_table(spark, sf_dir, "embeddings")
        corpus = e.select(
            F.col("vec_id").alias("neighbor_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
        )
        assigned, centers = ivf_build_assignments(corpus, n_lists=n_lists)
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centers)],
            "cell int, center array<double>",
        )
        _write(cent_df, os.path.join(tmp, "ann_centroids"))
        (
            assigned.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(tmp, "ann_corpus"))
        )

    return _published(f"ann-{sf_name}-", tag, ANN_TABLES, build)


# ---------------------------------------------------------------------------
# Incremental index maintenance — the ingest-time contract, live.
# ---------------------------------------------------------------------------


def index_rows(docs: DataFrame) -> dict[str, DataFrame]:
    """Per-document index rows (no membership flag): minhash signatures,
    sig-denormalized band rows, and the Gopher quality bit. THE shared
    code path — :func:`pipeline_tables` (whole-fixture build) and
    :func:`index_batch` (streaming per-batch maintenance) both attach
    their membership flag to exactly these frames, so streamed and
    batch-built indexes are definitionally identical."""
    from go_nats_to_clickhouse_spark.operators.dedup import (
        band_buckets,
        minhash_signatures,
        word_shingles,
    )
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import gopher_flags

    sig = minhash_signatures(word_shingles(docs), num_hashes=16).localCheckpoint(
        eager=False
    )
    return {
        "doc_sigs": sig.select("doc_id", "sig"),
        "doc_bands": band_buckets(sig, bands=4, rows=4)
        .join(sig, "doc_id")
        .select("doc_id", "band", "bucket", "sig"),
        "doc_quality": gopher_flags(docs).select("doc_id", "passes_gopher"),
    }


def index_batch(docs: DataFrame, is_new: bool = True) -> dict[str, DataFrame]:
    """The ingest-time index artifacts for ONE batch of documents — the
    shared :func:`index_rows` frames with a constant membership flag."""
    flag = F.lit(bool(is_new)).alias("is_new")
    return {name: df.select("*", flag) for name, df in index_rows(docs).items()}


def append_batch_index(docs: DataFrame, out_root: str, is_new: bool = True) -> None:
    """Append one batch's index rows to the persisted tables under
    ``out_root`` — the foreachBatch body of the streaming maintainer.
    Append-only parquet: each micro-batch adds files, never rewrites
    (compaction is :func:`plans.layout.compact_table`'s job, exactly as
    for the event tables)."""
    for name, df in index_batch(docs, is_new=is_new).items():
        df.write.mode("append").parquet(os.path.join(out_root, name))


def start_doc_index_stream(
    spark: SparkSession,
    source_dir: str,
    out_root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Maintain the signature/band/quality index AS DOCUMENTS ARRIVE: a
    file-source stream over a documents directory whose every micro-batch
    appends its index rows via :func:`append_batch_index` — the reference's
    insert-triggered-MV contract (init.sql:100-121) applied to the
    LLM-pipeline tables, so downstream manifest/dedup queries always read
    a current index without ever re-scanning corpus text.

    Exactly-once per batch: foreachBatch + the stream checkpoint replay
    the same epoch only after a crash BEFORE the commit; a replayed epoch
    re-appends rows for the same doc_ids, which downstream consumers
    dedup by doc_id (at-least-once, same contract as the event pipeline's
    idempotent sinks). Returns the StreamingQuery."""
    schema = spark.read.parquet(source_dir).schema

    def _per_batch(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch_index(batch_df, out_root, is_new=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(_per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
