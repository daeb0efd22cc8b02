"""sf1.0 probe of the heavy families (VERDICT r8 #5): convert the
"designed for 100x" plan-shape claims into a MEASURED wall-time slope
sf0.1 -> sf1.

No sf1 fixtures exist, so the probe synthesizes one at /tmp by
replicating the sf0.1 tables 10x with a structure-preserving transform:

* documents — replica k prefixes every word with ``r<k>`` (replica 0 is
  the original). Within a replica, every shingle set is ISOMORPHIC to
  the original's (a uniform word bijection), so the internal near-dup
  pair structure is preserved exactly; across replicas no shingle ever
  matches, so cross-replica pairs are zero. Result: pair count, cluster
  structure, and survivor fraction scale exactly 10x — a clean linear
  reference against which any super-linear build time is a PLAN
  property, not a data artifact. doc_id shifts by k * 10^6; source is
  kept, so the day-2/day-3 generation fractions are preserved.
* embeddings — vec_id shifts by k * 10^6; each component gets a small
  deterministic hash jitter so replicas are not coincident directions
  (coincident copies would degenerately densify IVF cells).
* lineitem / orders / customer / supplier / part (round 9) — every key
  column shifts by k * 10^8, the SAME shift across tables, so each
  replica is a self-contained TPC-H universe: every join hits exactly
  its own replica's rows (fan-outs preserved, join selectivity
  unchanged, group counts x10 where the key domain grows). nation and
  region stay shared dimensions (as at real scale).
* events (round 12, fixture v3) — replica k shifts event_id by k * 10^6
  and user_id by k * 10^8 over the SAME time range: 10x events per
  window and a 10x user universe, so the streaming / stats / sketch
  rows finally measure a REAL 10x (before v3 events was byte-copied and
  their "slopes" were same-data re-runs — a measurement hole, fixed).
* every other table is copied through unchanged.

Both scales are then built COLD (SPARK_GRAFT_MAT_DIR pointed at a fresh
temp root) and timed over the same units:

  build: pipeline_tables (signatures/bands/exact-verify/CC/survivors),
         gen3_tables (promotion chain), ann_tables (IVF+PQ index),
         ingested_index_tables (the composed streaming service);
  read:  pipeline_training_manifest, pipeline_dedup_provenance_day3,
         vector_ann_ivfpq_read_topk, dedup_connected_components,
         and (round 9) the relational family: q1_pricing_summary
         (two-phase hash agg over the fact), q8_national_market_share
         (8-table broadcast star + one shuffle), q21_waiting_suppliers
         (fact-fact decorrelated EXISTS — the shuffle-heaviest TPC-H
         pattern in the registry).

Output: one JSON line per (unit, sf) with seconds, plus a final slope
summary {unit: sf1_seconds / sf0.1_seconds}. Linear scaling target on
local[32] is <= ~10 (10x rows over fixed cores); the PERF_NOTES table
records the measured values and flags anything materially above it.

Usage:
    python tools/sf1_probe.py [base_sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPLICAS = 10
OFFSET = 1_000_000
# TPC-H key shift per replica (round 9): one shared value across all key
# columns keeps each replica a self-contained join universe.
KEY_OFFSET = 100_000_000
TPCH_KEYS = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
}


def build_sf1(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    from go_nats_to_clickhouse_spark.schemas import TESTDATA_SCHEMAS, load_table

    os.makedirs(out, exist_ok=True)
    for t in TESTDATA_SCHEMAS:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t not in ("documents", "embeddings", "events", *TPCH_KEYS):
            shutil.copyfile(src, dst)

    # events: 10x DISTINCT-USER replication (fixture v3 — before round
    # 12 events was byte-copied, which silently made every events-based
    # "10x slope" a same-data re-run). New replicas get disjoint
    # event_id/user_id ranges over the SAME time range: 10x density per
    # window and 10x user universe, the natural scale-up for the
    # streaming/stats/sketch rows.
    ev = load_table(spark, base, "events")
    ereps = []
    for k in range(REPLICAS):
        if k == 0:
            ereps.append(ev)
            continue
        ereps.append(
            ev.select(
                (F.col("event_id") + F.lit(k * OFFSET)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(k * KEY_OFFSET)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    ebig = ereps[0]
    for r in ereps[1:]:
        ebig = ebig.unionByName(r)
    ebig.coalesce(1).write.mode("overwrite").parquet(out + "/_events_tmp")
    _single_file(out + "/_events_tmp", os.path.join(out, "events.parquet"))

    for t, keys in TPCH_KEYS.items():
        tbl = load_table(spark, base, t)
        treps = []
        for k in range(REPLICAS):
            if k == 0:
                treps.append(tbl)
                continue
            shifted = tbl.select(
                *[
                    (F.col(c) + F.lit(k * KEY_OFFSET)).alias(c)
                    if c in keys
                    else F.col(c)
                    for c in tbl.columns
                ]
            )
            treps.append(shifted)
        tbig = treps[0]
        for r in treps[1:]:
            tbig = tbig.unionByName(r)
        tbig.coalesce(1).write.mode("overwrite").parquet(out + f"/_{t}_tmp")
        _single_file(out + f"/_{t}_tmp", os.path.join(out, f"{t}.parquet"))
    docs = load_table(spark, base, "documents")
    reps = []
    for k in range(REPLICAS):
        if k == 0:
            reps.append(docs)
            continue
        tag = F.lit(f"r{k}")
        text = F.array_join(
            F.transform(
                F.split(F.col("text"), " "), lambda w: F.concat(tag, w)
            ),
            " ",
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("long").alias("n_chars"),
            )
        )
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    # single FILE per table: load_table probes the parquet footer
    big.coalesce(1).write.mode("overwrite").parquet(out + "/_docs_tmp")
    _single_file(out + "/_docs_tmp", os.path.join(out, "documents.parquet"))

    vecs = load_table(spark, base, "embeddings")
    vreps = []
    for k in range(REPLICAS):
        if k == 0:
            vreps.append(vecs)
            continue
        jitter = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x
                + (
                    F.pmod(
                        F.col("vec_id") * 31 + i * 7 + F.lit(k), F.lit(17)
                    )
                    - 8
                ).cast("double")
                * 0.01
            ).cast("float"),
        )
        vreps.append(
            vecs.select(
                (F.col("vec_id") + F.lit(k * OFFSET)).alias("vec_id"),
                jitter.alias("embedding"),
                *[c for c in vecs.columns if c not in ("vec_id", "embedding")],
            )
        )
    vbig = vreps[0]
    for r in vreps[1:]:
        vbig = vbig.unionByName(r.select(*vbig.columns))
    vbig.coalesce(1).write.mode("overwrite").parquet(out + "/_vecs_tmp")
    _single_file(out + "/_vecs_tmp", os.path.join(out, "embeddings.parquet"))


def _single_file(spark_dir: str, dest: str) -> None:
    part = [f for f in os.listdir(spark_dir) if f.endswith(".parquet")]
    assert len(part) == 1
    shutil.move(os.path.join(spark_dir, part[0]), dest)
    shutil.rmtree(spark_dir)


def probe(spark, sf_dir: str, label: str) -> dict[str, float]:
    from go_nats_to_clickhouse_spark.plans import materialize as M
    from go_nats_to_clickhouse_spark.queries import QUERIES

    times: dict[str, float] = {}

    def timed(unit, fn):
        t0 = time.time()
        fn()
        times[unit] = round(time.time() - t0, 2)
        print(json.dumps({"unit": unit, "sf": label, "sec": times[unit]}), flush=True)

    timed("build_pipeline", lambda: M.pipeline_tables(spark, sf_dir))
    timed("build_gen3", lambda: M.gen3_tables(spark, sf_dir))
    timed("build_ann", lambda: M.ann_tables(spark, sf_dir))
    timed("build_ingested", lambda: M.ingested_index_tables(spark, sf_dir))
    for q in (
        "pipeline_training_manifest",
        "pipeline_dedup_provenance_day3",
        "vector_ann_ivfpq_read_topk",
        "dedup_connected_components",
        "q1_pricing_summary",
        "q8_national_market_share",
        "q21_waiting_suppliers",
    ):
        timed(f"read_{q}", lambda q=q: QUERIES[q](spark, sf_dir).collect())

    # round 9: text skip indexes over the ingested analytics table —
    # build cost and pruned-search cost at both scales, plus the
    # pruning ratio the sidecar achieves (printed, not timed).
    from go_nats_to_clickhouse_spark.plans import layout as L
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ingested_index_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import ANALYTICS_TABLE

    ana = os.path.join(
        ingested_index_tables(spark, sf_dir)["warehouse"], ANALYTICS_TABLE
    )
    timed("build_token_bloom", lambda: L.build_token_bloom(spark, ana, "message_text"))
    timed("build_ngram_bloom", lambda: L.build_ngram_bloom(spark, ana, "message_text"))

    def _search_token():
        _df, rep = L.search_token_pruned(spark, ana, "message_text", "dup")
        _df.write.format("noop").mode("overwrite").save()
        print(json.dumps({"unit": "token_prune_ratio", "sf": label, **rep}), flush=True)

    def _search_like():
        _df, rep = L.search_like_pruned(spark, ana, "message_text", " dup")
        _df.write.format("noop").mode("overwrite").save()
        print(json.dumps({"unit": "ngram_prune_ratio", "sf": label, **rep}), flush=True)

    timed("search_token_pruned", _search_token)
    timed("search_like_pruned", _search_like)

    # round 10 (VERDICT r9 #4): the streaming family under real
    # micro-batch triggers, and the exact-substring dedup pair (inline
    # span-merge + persisted gram index). Streaming rows at fixture
    # scale are trigger-job-floor-dominated — the slope shows how much
    # of the wall time is data-volume-bound vs floor. The replay
    # fixtures are prebuilt OUTSIDE the timed units (the same warmup
    # solo_bench does) so the slope measures the pipeline, not fixture
    # synthesis.
    from go_nats_to_clickhouse_spark.queries.streaming import (
        _events_stream,
        _late_replay_fixture,
    )

    for copies in (1, 2):
        _events_stream(spark, sf_dir, copies=copies)
    _late_replay_fixture(spark, sf_dir)
    for q in (
        "streaming_tumbling_daily",
        "streaming_stream_stream_join",
        "streaming_stateful_running_counts",
    ):
        timed(
            f"read_{q}",
            lambda q=q: QUERIES[q](spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    timed(
        "read_dedup_repeated_substring",
        lambda: QUERIES["dedup_repeated_substring"](spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    timed("build_gram_index", lambda: M.gram_index_tables(spark, sf_dir))
    timed(
        "read_dedup_repeated_substring_read",
        lambda: QUERIES["dedup_repeated_substring_read"](spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # round 11 (VERDICT r10 #5): the erase/promote lifecycle — the one
    # heavy family whose slopes were still inferred from design rather
    # than measured. Each erase build is index SURGERY (filter-rewrites
    # + generational pair-graph replay / touched-cell ANN rewrite), so
    # its slope should track the index size, never the from-scratch
    # rebuild; the reads are the UNCHANGED manifest/topk consumers over
    # the erased tables. Prerequisite builds (gen4 promotion loop, the
    # appended ANN index) get their own timed units so the erase units
    # measure surgery alone, not a lazily-triggered upstream build.
    timed("build_gen4", lambda: M.gen4_tables(spark, sf_dir))
    timed("build_ann_appended", lambda: M.ann_appended_tables(spark, sf_dir))
    timed("build_erased", lambda: M.erased_tables(spark, sf_dir))
    timed("build_erased_gen3", lambda: M.erased_gen3_tables(spark, sf_dir))
    timed("build_erased_gen4", lambda: M.erased_gen4_tables(spark, sf_dir))
    timed("build_erased_ann2", lambda: M.erased_ann2_tables(spark, sf_dir))
    for q in (
        "pipeline_manifest_erased",
        "pipeline_manifest_erased_day3",
        "pipeline_manifest_erased_day4",
        "vector_ann_erased_appended_topk",
    ):
        timed(
            f"read_{q}",
            lambda q=q: QUERIES[q](spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    # rounds 11-12: the gram-index lifecycle matrix — erase surgery,
    # incremental append (base 3/4 + held-out quarter), the composed
    # append-then-erase cell, the streaming maintainer, and the
    # append-then-compact cell (round 12), plus their driver read rows
    # (queries/text_r11, registry-active since round 12).
    from go_nats_to_clickhouse_spark.queries import text_r11

    timed("build_erased_grams", lambda: M.erased_gram_index_tables(spark, sf_dir))
    timed(
        "build_appended_grams",
        lambda: M.appended_gram_index_tables(spark, sf_dir),
    )
    timed(
        "build_erased_appended_grams",
        lambda: M.erased_appended_gram_index_tables(spark, sf_dir),
    )
    timed(
        "build_streamed_grams",
        lambda: M.streamed_gram_index_tables(spark, sf_dir),
    )
    timed(
        "build_compacted_grams",
        lambda: M.compacted_gram_index_tables(spark, sf_dir),
    )
    for name, (fn, _oracle) in text_r11.r11b_rows().items():
        timed(
            f"read_{name}",
            lambda fn=fn: fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    return times


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1probe"
    mat = tempfile.mkdtemp(prefix="sf1probe-mat-")
    os.environ["SPARK_GRAFT_MAT_DIR"] = mat  # cold builds at BOTH scales

    from go_nats_to_clickhouse_spark.config import EngineConfig
    from go_nats_to_clickhouse_spark.session import get_spark

    spark = get_spark(EngineConfig(shuffle_partitions=32), app_name="sf1probe")
    # marker versions the fixture recipe: v2 added the 10x TPC-H replicas
    # v3 added the 10x events replication (v2: TPC-H replicas)
    marker = os.path.join(out, "_fixture_v3")
    if not os.path.exists(marker):
        t0 = time.time()
        build_sf1(spark, base, out)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("docs+vecs+tpch+events 10x\n")
        print(f"sf1 fixtures -> {out} ({time.time() - t0:.1f}s)", flush=True)

    small = probe(spark, base, "sf0.1")
    big = probe(spark, out, "sf1")
    slope = {u: round(big[u] / small[u], 2) for u in small if small[u] > 0}
    print(json.dumps({"slope_sf1_over_sf01": slope, "mat_root": mat}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
