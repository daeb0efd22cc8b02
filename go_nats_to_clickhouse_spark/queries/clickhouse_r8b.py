"""Round-8 additions, second batch.

* ``sort_limit_by`` — ClickHouse's ``LIMIT n BY expr`` clause (top-n
  rows per group BEFORE the outer LIMIT), the one result-shaping clause
  the registry still lacked.
* ``join_dict_ip_trie`` — the ``ip_trie`` dictionary layout: CIDR ->
  value with LONGEST-prefix-match lookup, spelled as a bounded prefix
  explode + broadcast equi-join (the LSH-banding shape, never a
  non-equi join).
* ``table_detach_attach_partition`` — ``ALTER TABLE ... DETACH /
  ATTACH / MOVE PARTITION TO TABLE`` (plans/layout.py), the partition
  lifecycle the reference's MergeTree tables (init.sql:17-19) get for
  free from the server.
* ``vector_ann_filtered_topk`` + ``vector_ann_filtered_read_topk`` —
  filtered vector search (predicate + ANN together), the exact brute
  twin with a full value oracle and the IVF-index-served path with the
  family's recall contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table
from go_nats_to_clickhouse_spark.queries.vector import _cos_sql, as_double

# ---------------------------------------------------------------------------
# LIMIT n BY expr — ClickHouse's per-group head clause
# ---------------------------------------------------------------------------


@query(
    "sort_limit_by",
    """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                                     o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents
FROM r WHERE rn <= 2
ORDER BY price_cents DESC, o_orderkey
LIMIT 100
""",
)
def sort_limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LIMIT n BY expr``: the first n rows per distinct
    value of the BY expression (in ORDER BY order), applied BEFORE the
    outer LIMIT — here each customer's two most expensive orders, then
    the global 100 priciest of those survivors. Spark spelling is a
    row_number window + rank filter; because the filter is a
    rank-over-window <= constant, Catalyst rewrites it to
    WindowGroupLimit (SPARK-37099): each map task keeps only its
    partial top-2 per customer BEFORE the shuffle, so the exchange
    carries O(2 x customers) rows, not O(orders) — the same partial
    top-n economics ClickHouse's LIMIT BY streaming transform has.
    Integer cents everywhere: ordering, ties (broken by o_orderkey) and
    the final hash are float-free."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("price_cents"), F.asc("o_orderkey")
    )
    per_cust = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )
    return per_cust.orderBy(F.desc("price_cents"), "o_orderkey").limit(100)


# ---------------------------------------------------------------------------
# ip_trie dictionary — CIDR longest-prefix-match lookup
# ---------------------------------------------------------------------------

#: (network, base address as uint32, prefix length) — the dictionary
#: source rows; '/0 internet' is the catch-all every address matches,
#: so the lookup is total and needs no outer join. corp-eu nests inside
#: corp which nests inside internet: the rows that make LONGEST-match
#: observable.
_IP_DIM = [
    ("internet", 0, 0),
    ("corp", 167772160, 8),  # 10.0.0.0/8
    ("cgnat", 1681915904, 10),  # 100.64.0.0/10
    ("corp-eu", 167837696, 16),  # 10.1.0.0/16
    ("private", 3232235520, 16),  # 192.168.0.0/16
]

_IP_DIM_SQL = """dim(network, base, plen) AS (VALUES
  ('internet', CAST(0 AS BIGINT), 0),
  ('corp', CAST(167772160 AS BIGINT), 8),
  ('cgnat', CAST(1681915904 AS BIGINT), 10),
  ('corp-eu', CAST(167837696 AS BIGINT), 16),
  ('private', CAST(3232235520 AS BIGINT), 16))"""


@query(
    "join_dict_ip_trie",
    f"""
WITH ips AS (
  SELECT event_id,
         (user_id * 2654435761) % 4294967296 AS ip,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
{_IP_DIM_SQL},
m AS (
  SELECT i.event_id, i.cents, d.network,
         ROW_NUMBER() OVER (PARTITION BY i.event_id
                            ORDER BY d.plen DESC) AS rn
  FROM ips i JOIN dim d
    ON (i.ip >> (32 - d.plen)) = (d.base >> (32 - d.plen))
)
SELECT network,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM m WHERE rn = 1
GROUP BY network ORDER BY network
""",
)
def join_dict_ip_trie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ip_trie`` dictionary lookup (ClickHouse's CIDR dictionary
    layout, ``dictGetString(..., tuple(IPv4...))`` — the classifier the
    reference's analytics tables would use for client-IP enrichment):
    each event's IPv4 (derived deterministically from user_id by a
    Knuth multiplicative hash, identical integer math in both engines)
    resolves to the LONGEST matching CIDR in the dictionary.

    Scale shape: longest-prefix match is NOT spelled as a non-equi
    range join (a shuffled theta-join at 100 TB). The dictionary's
    distinct prefix LENGTHS are its geometry (here 4, /0 /8 /10 /16);
    each event explodes to one (length, ip>>(32-length)) candidate per
    length — a bounded fan-out exactly like LSH banding — which
    broadcast-equi-joins the prefix-keyed dictionary, and one hash
    aggregate (max_by on prefix length) picks the most specific match
    per event. Map-side only: no shuffle touches the events table
    beyond the final GROUP BY on the (tiny) network key."""
    lens = sorted({plen for _, _, plen in _IP_DIM})
    dim = spark.createDataFrame(
        [(n, plen, (base >> (32 - plen)) if plen else 0)
         for n, base, plen in _IP_DIM],
        "network string, plen int, prefix long",
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)).alias("ip"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cand = ev.select(
        "event_id",
        "cents",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(plen).alias("plen"),
                    F.shiftright("ip", 32 - plen).alias("prefix"),
                )
                for plen in lens
            ])
        ).alias("c"),
    ).select("event_id", "cents", "c.plen", "c.prefix")
    best = (
        cand.join(F.broadcast(dim), ["plen", "prefix"])
        .groupBy("event_id", "cents")
        .agg(F.max_by("network", "plen").alias("network"))
    )
    return (
        best.groupBy("network")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("network")
    )


# ---------------------------------------------------------------------------
# ALTER TABLE ... DETACH / ATTACH / MOVE PARTITION TO TABLE
# ---------------------------------------------------------------------------


@query(
    "table_detach_attach_partition",
    """
WITH d AS (
  SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT CASE WHEN day = 20240110 THEN 'dest' ELSE 'base' END AS tbl,
       day,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM d WHERE day <> 20240103
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def table_detach_attach_partition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition lifecycle (``ALTER TABLE ... DETACH PARTITION /
    ATTACH PARTITION / MOVE PARTITION TO TABLE`` — the MergeTree ops
    the reference's ``PARTITION BY toYYYYMM`` tables, init.sql:17-19,
    inherit from the server): the tmaint family detached days 2 and 3,
    re-attached day 2 (round trip), and MOVED day 10 into the cold
    archive table ``events_attach_dest``. Every step was ONE directory
    rename into/out of the ``_detached/`` namespace — zero parquet
    bytes read, copied, or rewritten (mtime-pinned in tests), O(1) in
    partition size, which is why detaching a month at 100 TB costs the
    same syscall as at 100 MB. This row reads both tables plain: day 3
    must be invisible (still detached), day 2 fully back, day 10
    visible only in the archive — the oracle recomputes that exact
    visible state from the raw events."""
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    base = spark.read.parquet(t["events_detached"]).select(
        F.lit("base").alias("tbl"),
        F.col("ym").cast("long").alias("day"),
        "value_cents",
    )
    dest = spark.read.parquet(t["events_attach_dest"]).select(
        F.lit("dest").alias("tbl"),
        F.col("ym").cast("long").alias("day"),
        "value_cents",
    )
    return (
        base.unionByName(dest)
        .groupBy("tbl", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("tbl", "day")
    )


# ---------------------------------------------------------------------------
# Filtered vector search — predicate + ANN in one query
# ---------------------------------------------------------------------------

_FILTERED_ANN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE label % 2 = 0
),
scored AS (
  SELECT query_id, vec_id AS neighbor_id,
         {_cos_sql('qv', 'cv')} AS cos
  FROM q, c
  WHERE vec_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM scored
)
SELECT query_id, neighbor_id, rank, ROUND(cos, 4) + 0.0 AS cosine
FROM ranked WHERE rank <= 5
"""


@query("vector_ann_filtered_topk", _FILTERED_ANN_ORACLE)
def vector_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search, exact baseline: top-5 cosine neighbors
    among ONLY the corpus rows satisfying a metadata predicate
    (``label % 2 = 0``) — the retrieval shape every RAG/dedup pipeline
    hits the moment queries say "nearest neighbor WHERE source = X".
    PRE-filtering semantics: the predicate prunes the corpus before any
    score, so every query gets k matching results (post-filtering a
    plain top-k under-fills exactly when the filter is selective). Same
    broadcast-queries / map-side-score / tiny-pairs-shuffle shape as
    vector_ann_cosine_topk; the predicate reaches the parquet scan as a
    pushed filter. The IVF-index twin is
    vector_ann_filtered_read_topk."""
    from go_nats_to_clickhouse_spark.operators.similarity import (
        brute_force_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
    )
    c = e.filter(F.pmod(F.col("label"), F.lit(2)) == 0).select(
        F.col("vec_id").alias("neighbor_id"),
        as_double("embedding").alias("cv"),
    )
    return brute_force_topk(q, c, k=5).select(
        "query_id",
        "neighbor_id",
        "rank",
        (F.round("cos", 4) + F.lit(0.0)).alias("cosine"),
    )


@query(
    "vector_ann_filtered_read_topk",
    """
SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 8
""",
)
def vector_ann_filtered_read_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered ANN served from the MATERIALIZED IVF index: the
    ``label % 2 = 0`` allow-set is semi-joined into the probed cells
    BEFORE any cosine is computed (pre-filtering inside the index read
    — operators/similarity.ivf_read_topk's ``keep``), so the shortlist
    always holds k predicate-satisfying rows. The probe list still
    drives dynamic partition pruning (only nprobe/n_lists of corpus
    files read); the allow-set join touches only that probed slice. At
    100 TB the hot filter attributes live IN the index rows and this
    semi join degenerates to a scan-level predicate — documented on the
    operator. Same driver-verifiable recall contract as
    vector_ann_ivf_read_topk (recall@5 >= 0.4 per query vs the exact
    FILTERED brute force)."""
    from go_nats_to_clickhouse_spark.operators.similarity import (
        brute_force_topk,
        ivf_read_topk,
    )
    from go_nats_to_clickhouse_spark.plans.materialize import ann_tables

    t = ann_tables(spark, sf_dir)
    centers = [
        list(r.center)
        for r in spark.read.parquet(t["ann_centroids"]).orderBy("cell").collect()
    ]
    assigned = spark.read.parquet(t["ann_corpus"])
    e = load_table(spark, sf_dir, "embeddings")
    keep = e.filter(F.pmod(F.col("label"), F.lit(2)) == 0).select(
        F.col("vec_id").alias("neighbor_id")
    )
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
    )
    ivf = ivf_read_topk(q, assigned, centers, nprobe=12, k=5, keep=keep).select(
        "query_id", "neighbor_id"
    )
    c = e.filter(F.pmod(F.col("label"), F.lit(2)) == 0).select(
        F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv")
    )
    brute = brute_force_topk(q, c, k=5).select("query_id", "neighbor_id")
    hits = (
        ivf.join(brute, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        q.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) / 5 >= 0.4).alias("recall_ok"),
        )
    )
