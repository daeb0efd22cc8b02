"""Round-8 additions.

* ``agg_weighted_median_exact`` — the SCALE-SAFE twin of
  ``agg_weighted_median_udaf`` (VERDICT r7 #4): same oracle, same
  integer-exact lower-weighted-median semantics, but spelled as a
  (group, value)-histogram reduce followed by a cumulative pick — every
  stage map-side-combinable SQL, no per-group single-task collect. The
  pair documents the grouped-agg-pandas-UDF tradeoff the way
  ``agg_hll_state_merge`` / ``agg_ddsketch_quantiles`` pair lossy vs
  lossless merging: the UDAF ships all of a group's rows to one task
  (ClickHouse ``quantileExactWeighted`` carries the same per-group
  memory bound, AggregateFunctions/QuantileExactWeighted.h in the
  public ClickHouse sources); the exact twin's only full-row shuffle is
  the histogram groupBy, after which state is bounded by DISTINCT
  values per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.hints import bounded
from pyspark.sql.window import Window

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

_WMEDIAN_ORACLE = """
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
g AS (SELECT flag, x, SUM(w) AS w FROM v GROUP BY 1, 2),
c AS (
  SELECT flag, x,
         SUM(w) OVER (PARTITION BY flag ORDER BY x) AS cum,
         SUM(w) OVER (PARTITION BY flag) AS tot
  FROM g
)
SELECT flag, CAST(MIN(x) AS BIGINT) AS wmedian_cents
FROM c WHERE 2 * cum >= tot GROUP BY flag ORDER BY flag
"""


@query("agg_weighted_median_exact", _WMEDIAN_ORACLE)
def agg_weighted_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag, 100-TB spelling:
    reduce (flag, cents) to a weight histogram FIRST (map-side partial
    aggregation, the only shuffle proportional to input rows), then run
    the cumulative pick over the histogram — whose width is bounded by
    DISTINCT prices per flag, not row count. Hash-equal to
    ``agg_weighted_median_udaf`` (clickhouse_r7.py), which pins the
    grouped-agg pandas UDF API surface against this scalable twin; both
    share one oracle. Integer cents end-to-end: sort, cumsum, and the
    2*cum >= tot threshold are exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    hist = li.groupBy("flag", "x").agg(F.sum("w").alias("w"))
    cum_w = Window.partitionBy("flag").orderBy("x")
    tot_w = Window.partitionBy("flag")
    c = hist.select(
        "flag",
        "x",
        F.sum("w").over(cum_w).alias("cum"),
        F.sum("w").over(tot_w).alias("tot"),
    )
    return (
        c.where(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(F.min("x").cast("long").alias("wmedian_cents"))
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# ClickHouse ANY JOIN strictness
# ---------------------------------------------------------------------------


@query(
    "join_any_left",
    """
SELECT c.c_custkey,
       CAST(MIN(o.o_orderkey) AS BIGINT) AS first_orderkey,
       CAST(arg_min(CAST(round(o.o_totalprice * 100) AS BIGINT),
                    o.o_orderkey) AS BIGINT) AS first_price_cents
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
""",
)
def join_any_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``LEFT ANY JOIN`` — at most ONE right row per left row
    (ClickHouse SELECT docs, join_default_strictness=ANY heritage; the
    served row is whichever arrives first, i.e. nondeterministic there —
    made deterministic here as the MIN-orderkey order, the only
    cross-engine-pinnable reading). Customers pick up their first
    order's key and price; customers without orders keep nulls, exactly
    LEFT ANY semantics.

    Scale shape — the reason ANY JOIN exists: REDUCE THE RIGHT SIDE
    FIRST. min/min_by aggregate orders to one row per custkey with full
    map-side partial aggregation (the shuffle carries one row per
    distinct key, not one per order), then a plain equi-join attaches
    it. The naive spelling — join all orders then window row_number=1 —
    shuffles every order row and sorts per key; at 100 TB the
    aggregate-then-join form is strictly smaller on every exchange.
    Price pinned to integer cents (standing cross-engine float rule)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    first = o.groupBy("o_custkey").agg(
        F.min("o_orderkey").cast("long").alias("first_orderkey"),
        F.min_by("price_cents", "o_orderkey").cast("long").alias(
            "first_price_cents"
        ),
    )
    return (
        c.join(first, c["c_custkey"] == first["o_custkey"], "left")
        .select("c_custkey", "first_orderkey", "first_price_cents")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# SummingMergeTree — merge-time pre-aggregation as a physical table
# ---------------------------------------------------------------------------


@query(
    "table_summing_merge",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       CAST(SUM(value_cents) AS BIGINT) AS total_cents
FROM (
  SELECT event_type,
         CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day,
         user_id,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events
  GROUP BY 1, 2, 3
)
GROUP BY event_type
ORDER BY event_type
""",
)
def table_summing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree driver row: ``events_summed``
    (plans/materialize.tmaint_tables) was written as one row per event
    — (day partition, event_type, user_id, value_cents, cnt=1) — then
    plans/layout.summing_compact collapsed equal sorting keys within
    each partition into summed rows, ClickHouse's merge-time
    pre-aggregation. This query reads the PHYSICAL table and reports,
    per event_type: how many stored rows remain (n_rows — which must
    equal the distinct (day, user_id) key count, proving the merge
    actually collapsed), and the summed cnt/value_cents (which must
    equal the raw totals, proving the merge lost nothing). The oracle
    recomputes both from the raw events through the same two-level
    aggregation. Reads still GROUP BY (the ClickHouse discipline —
    merges are eventual there); integer cents throughout."""
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    s = spark.read.parquet(t["events_summed"])
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cnt").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# AggregatingMergeTree — a persisted -State column merged at read
# ---------------------------------------------------------------------------


@query(
    "table_agg_state_read",
    """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST(COUNT(DISTINCT CAST(strftime(ts, '%Y%m%d') AS BIGINT)) AS BIGINT)
         AS n_state_rows,
       TRUE AS merged_within_bounds
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def table_agg_state_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree as a PHYSICAL table (the completion of the
    -State/-Merge story: agg_partial_state_merge pins in-memory exact
    states, agg_hll_state_merge pins in-memory sketch states, THIS row
    pins states AT REST): ``events_hll_state`` stores one DataSketches
    HLL sketch blob per (day partition, event_type) — exactly what a
    ClickHouse MV with a ``uniqCombinedState`` column materializes into
    an AggregatingMergeTree target (the reference's init.sql MV pattern
    one engine-feature further) — and this read path -Merges the
    persisted blobs per event_type. Contract: the merged estimate sits
    within 5% of exact (lgK=12, ~1.6% standard error — day-sharded
    union, a THIRD sharding alongside agg_hll_state_merge's 4/3-way,
    pinning again that only the bound survives merge history), and the
    state table holds exactly one blob per (day, type). Sketch bits
    stay out of the hashed output (engine-specific); the oracle pins
    exact counts, state-row geometry, and the bound boolean.

    Scale shape: the read touches only sketch blobs (bytes per
    partition-key, never raw rows) — the 100-TB point of persisting
    -State: incremental MV refresh appends a day's blob, reads merge
    O(days x types) states."""
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables
    from go_nats_to_clickhouse_spark.schemas import load_table

    t = tmaint_tables(spark, sf_dir)
    h = spark.read.parquet(t["events_hll_state"])
    merged = h.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).cast("long").alias("n_state_rows"),
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            "n_state_rows",
            (
                F.abs(F.col("est") - F.col("n_exact"))
                <= F.lit(0.05) * F.col("n_exact")
            ).alias("merged_within_bounds"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ClickHouse aggregate-function COMBINATORS: the -If family
# ---------------------------------------------------------------------------


@query(
    "agg_combinators_if",
    """
SELECT event_type,
       CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS cnt_if,
       CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT))
                     FILTER (WHERE value > 100), 0) AS BIGINT) AS sum_cents_if,
       CAST(MAX(CAST(round(value * 100) AS BIGINT))
            FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS max_cents_even,
       CAST(COUNT(DISTINCT user_id) FILTER (WHERE value > 100) AS BIGINT)
         AS uniq_users_if
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_combinators_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse ``-If`` aggregate combinator family — ``countIf``,
    ``sumIf``, ``maxIf``, ``uniqExactIf`` — in one grouped pass
    (ClickHouse docs, aggregate-function combinators; the idiom the
    reference's analytics consumers use for conditional KPIs without a
    second scan). ANSI spelling is the FILTER clause; Spark's is the
    conditional-aggregation ``agg(f(when(cond, x)))`` pattern, which
    Catalyst keeps inside ONE map-side-combinable hash aggregate — four
    conditional aggregates cost one scan and one shuffle, identical to
    the unconditioned query's plan. All sums in integer cents; the empty
    sumIf group coalesces to 0 on both sides (Spark sum(empty)=null,
    ClickHouse sumIf(empty)=0 — the 0 is the reference semantics)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hot = F.col("value") > 100
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.when(hot, 1)).cast("long").alias("cnt_if"),
            F.coalesce(F.sum(F.when(hot, cents)), F.lit(0))
            .cast("long")
            .alias("sum_cents_if"),
            F.max(F.when(F.pmod("user_id", F.lit(2)) == 0, cents))
            .cast("long")
            .alias("max_cents_even"),
            F.countDistinct(F.when(hot, F.col("user_id")))
            .cast("long")
            .alias("uniq_users_if"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Projections — alternate physical layouts auto-selected at query time
# ---------------------------------------------------------------------------


@query(
    "table_projection_route",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
ORDER BY event_type
""",
)
def table_projection_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse PROJECTIONS as physical layout + query routing: the
    tmaint family materializes ``events_proj_type`` — the same rows as
    the monthly-layout base copy, re-partitioned by event_type and
    re-sorted (plans/layout.build_projection — ALTER TABLE ... ADD
    PROJECTION + MATERIALIZE) — and plans/layout.read_with_projection
    AUTO-SELECTS it for this type-filtered aggregate (the
    optimize_use_projections decision, made from the query's filter
    columns). The scan then LISTS ONLY the two matching event_type
    partition directories — at 100 TB a 5-type table serves a
    type-filtered query from 2/5 of its bytes before any row is read,
    which is the entire point of paying a projection's storage. The
    routing decision is pinned in tests (chosen path == the
    projection; an un-matched filter falls back to base); green here
    proves the alternate layout serves exactly the base answer."""
    from go_nats_to_clickhouse_spark.plans.layout import read_with_projection
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    df, _chosen = read_with_projection(
        spark,
        t["events_base"],
        {"event_type": t["events_proj_type"]},
        {"event_type"},
    )
    return (
        df.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ALTER TABLE ... UPDATE — the column-mutation sibling of DELETE
# ---------------------------------------------------------------------------


@query(
    "table_update_mutation",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN event_type = 'error'
                      AND CAST(strftime(ts, '%Y%m%d') AS BIGINT) <= 20240105
                     THEN CAST(round(value * 100) AS BIGINT) + 100000
                     ELSE CAST(round(value * 100) AS BIGINT) END)
            AS BIGINT) AS total_cents
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def table_update_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE ... UPDATE col = expr WHERE cond`` as a physical
    mutation (ClickHouse mutations; the column-rewrite sibling of the
    DELETE mutation plans/layout.erase_keys already mirrors):
    ``events_mutated`` had every error row in its first five day
    partitions re-priced by +100000 cents through
    plans/layout.update_mutation — ONLY those five partitions were
    rewritten (the WHERE carries the partition key, so the affected-set
    scan prunes to them; the other 26 days' files stay byte-identical,
    mtime-pinned in tests). This row reads the mutated table plain; the
    oracle recomputes the same mutation as a CASE over the raw events —
    green proves the part-rewrite applied exactly the predicate, no
    more, no less. Integer cents end-to-end."""
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    m = spark.read.parquet(t["events_mutated"])
    return (
        m.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "table_ttl_column",
    """
SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN CAST(strftime(ts, '%Y%m%d') AS BIGINT) < 20240116
                     THEN 0
                     ELSE CAST(round(value * 100) AS BIGINT) END)
            AS BIGINT) AS total_cents
FROM events GROUP BY day ORDER BY day
""",
)
def table_ttl_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-level TTL — ``value_cents Int64 TTL ts + INTERVAL 15 DAY``
    (ClickHouse column TTL: when a column's TTL expires, its VALUES
    reset to the column default while the rows remain) — the value-
    expiry half of the TTL story next to table_ttl_expiry's whole-
    partition row expiry. ``events_col_ttl`` applied it as one
    plans/layout.update_mutation call (expired partitions rewritten,
    the live tail byte-untouched); this row reads the table plain and
    must show every pre-cutoff day with its full row count but ZERO
    cents, every post-cutoff day untouched — the oracle recomputes the
    expiry as a CASE. The operational point at 100 TB: column TTL frees
    the bytes of one wide column without losing row history, and the
    rewrite prunes to expired partitions exactly like the DELETE/UPDATE
    mutations sharing the machinery."""
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    c = spark.read.parquet(t["events_col_ttl"])
    return (
        c.groupBy(F.col("ym").cast("long").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("day")
    )


@query(
    "table_lightweight_delete",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
WHERE NOT (event_type = 'signup'
           AND CAST(strftime(ts, '%Y%m%d') AS BIGINT) <= 20240110)
GROUP BY event_type
ORDER BY event_type
""",
)
def table_lightweight_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIGHTWEIGHT DELETE (ClickHouse ``DELETE FROM ... WHERE``) — the
    third deletion flavor beside the heavy mutation (erase_keys) and
    TTL: rows are masked IMMEDIATELY in an O(deleted-keys) sidecar with
    NO table file rewritten (mtime-pinned in tests — the whole point:
    instant visibility, deferred IO), every read goes through the
    ``_row_exists`` filter (plans/layout.read_with_mask — one broadcast
    anti-join), and the deferred plans/layout.apply_mask_compact merge
    makes it physical later. This row reads the masked table; the
    oracle applies the delete predicate as a WHERE — green proves the
    mask serves exactly the deleted-rows-absent answer the eventual
    physical state will. Tests additionally pin masked-read ==
    post-compaction-read and that compaction clears the mask."""
    from go_nats_to_clickhouse_spark.plans.layout import read_with_mask
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    m = read_with_mask(
        spark, t["events_lwd"], t["events_lwd_mask"], key_cols=("event_id",)
    )
    return (
        m.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# CollapsingMergeTree — sign-column state tracking
# ---------------------------------------------------------------------------


@query(
    "table_collapsing_read",
    """
SELECT user_id,
       CAST(arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS BIGINT)
         AS value_cents,
       CAST(1 AS BIGINT) AS live
FROM events GROUP BY user_id ORDER BY user_id
""",
)
def table_collapsing_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree end-to-end (ClickHouse's mutable-state-by-
    appends engine): ``events_collapsing`` treats each event as a state
    update for its user — every insert wrote a +1 state row AND a -1
    cancel row copying the previous state (the writer contract the
    engine docs prescribe), then plans/layout.collapsing_compact
    annihilated sign pairs within each user-bucket partition. This read
    runs the mandated discipline anyway — ``SUM(value_cents * sign)``
    per user ``HAVING SUM(sign) > 0`` — because ClickHouse merges are
    eventual and a correct reader never assumes full collapse. Green
    proves the whole chain lands exactly "latest value per user", which
    the oracle computes directly from raw events as arg_max.

    Scale shape: the table holds net state (one row per user after
    merge, 2N-U before), so the read aggregates over live-state-sized
    data, not event-history-sized — the entire reason this engine
    exists; compaction is partition-parallel and the read's groupBy is
    map-side combinable."""
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    c = spark.read.parquet(t["events_collapsing"])
    return (
        c.groupBy("user_id")
        .agg(
            F.sum(F.col("value_cents") * F.col("sign"))
            .cast("long")
            .alias("value_cents"),
            F.sum("sign").cast("long").alias("live"),
        )
        .filter(F.col("live") > 0)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# TTL ... GROUP BY — downsample-in-place rollup of aged partitions
# ---------------------------------------------------------------------------


@query(
    "table_ttl_rollup",
    """
WITH d AS (
  SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT day,
       CAST(CASE WHEN day < 20240116 THEN COUNT(DISTINCT event_type)
                 ELSE COUNT(*) END AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM d GROUP BY day ORDER BY day
""",
)
def table_ttl_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TTL ts + INTERVAL 15 DAY GROUP BY day, event_type SET cnt =
    sum(cnt), value_cents = sum(value_cents)`` — the third TTL flavor
    (whole-partition drop: table_ttl_expiry; value reset:
    table_ttl_column; THIS: downsample-in-place, ClickHouse table-TTL
    GROUP BY / the GraphiteMergeTree retention model).
    ``events_rollup``'s aged day partitions were rewritten by
    plans/layout.ttl_rollup to one aggregate row per event_type; live
    days stayed raw and byte-untouched (mtime-pinned in tests). This row
    reads the table plain: aged days must show n_rows == distinct types
    (the row-count collapse — the bytes saved) while n_events and
    total_cents remain the FULL raw totals (nothing lost at the coarser
    grain), and live days must be untouched raw counts. The oracle
    recomputes all three from raw events with the cutoff CASE.

    The 100-TB economics: observability tables keep raw data for N days
    and queryable rollups forever — aged bytes shrink by the
    rows-per-(day,type) factor while every SUM over history stays
    answerable; the rewrite pruned to expired partitions exactly like
    the mutation machinery it shares."""
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    r = spark.read.parquet(t["events_rollup"])
    return (
        r.groupBy(F.col("ym").cast("long").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cnt").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Merge engine — one virtual table over a regex of physical tables
# ---------------------------------------------------------------------------


@query(
    "table_merge_engine",
    """
WITH d AS (
  SELECT CASE WHEN CAST(strftime(ts, '%Y%m%d') AS BIGINT) <= 20240115
              THEN 'events_shard_early' ELSE 'events_shard_late' END AS tbl,
         event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN CAST(strftime(ts, '%Y%m%d') AS BIGINT) <= 20240115
              THEN NULL
              ELSE 'r' || CAST(user_id % 3 AS VARCHAR) END AS region
  FROM events
)
SELECT tbl, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(COUNT(DISTINCT region) AS BIGINT) AS n_regions
FROM d GROUP BY tbl, event_type ORDER BY tbl, event_type
""",
)
def table_merge_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ENGINE = Merge(db, '^events_shard_')`` (ClickHouse Merge
    engine; the reference's init.sql keeps per-stream sibling tables —
    nats_data_stream_* — which is exactly the family shape this engine
    exists to read as one): plans/layout.merge_engine resolves the
    regex against the warehouse, unions the members BY COLUMN NAME with
    missing columns null-filled, and exposes the provenance ``_table``
    virtual column. The shard family is time-split (days <= / >
    2024-01-15) and schema-evolved — the late shard carries a ``region``
    column the early shard predates — so the row pins all three engine
    behaviors at once: regex membership, the virtual column, and
    union-of-structures nulling (n_regions = 0 on the early shard, 3 on
    the late). The oracle rebuilds shard assignment and region from raw
    events.

    Scale shape: pure plan composition — each member keeps its own scan,
    pushed filters, and partition pruning under the union; a filter on
    ``_table`` would prune members before any IO."""
    import os as _os

    from go_nats_to_clickhouse_spark.plans.layout import merge_engine
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    root = _os.path.dirname(t["events_shard_early"])
    m = merge_engine(spark, root, r"^events_shard_")
    return (
        m.groupBy(F.col("_table").alias("tbl"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value_cents").cast("long").alias("total_cents"),
            F.countDistinct("region").cast("long").alias("n_regions"),
        )
        .orderBy("tbl", "event_type")
    )


# ---------------------------------------------------------------------------
# Row policies — row-level security compiled to scan predicates
# ---------------------------------------------------------------------------


@query(
    "table_row_policy",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
WHERE event_type <> 'purchase' AND user_id % 10 <> 0
GROUP BY event_type ORDER BY event_type
""",
)
def table_row_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW POLICIES (``CREATE ROW POLICY ... USING ... TO user``) — the
    row-level-security half of the ACL surface whose profile/quota half
    admission.AdmissionController already mirrors from the reference's
    users.xml: the ``analyst`` user reads events through one PERMISSIVE
    policy (non-purchase rows; permissive policies OR together) and one
    RESTRICTIVE policy (the held-out user cohort is scoped away;
    restrictive policies AND on top) — both combination rules live in
    admission.apply_row_policies, including ClickHouse's documented
    footgun that a table with any permissive policy shows NO rows to a
    user granted none (pinned in tests). The oracle is simply the
    composed WHERE — which is the point: policies compile to ordinary
    predicates under the scan (pushed filters / partition pruning
    apply), so row security costs exactly what the equivalent filter
    costs at any scale."""
    from go_nats_to_clickhouse_spark.admission import (
        apply_row_policies,
        reference_policies,
    )

    e = load_table(spark, sf_dir, "events")
    v = apply_row_policies(e, "events", "analyst", reference_policies())
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Sub-document exact dedup — paragraph granularity (C4/RefinedWeb style)
# ---------------------------------------------------------------------------


@query(
    "dedup_paragraph_exact",
    """
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS arr FROM documents
),
p AS (
  SELECT doc_id, source, CAST(t.g AS BIGINT) AS pos,
         array_to_string(list_slice(arr, t.g * 10 + 1, t.g * 10 + 10), ' ')
           AS para
  FROM d, UNNEST(range(CAST(ceil(len(arr) / 10.0) AS BIGINT))) AS t(g)
),
k AS (
  SELECT * FROM (
    SELECT p.*,
           row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
    FROM p
  ) WHERE rn = 1
),
b AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS paras_total
      FROM p GROUP BY source),
a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS paras_kept,
             CAST(SUM(length(para)) AS BIGINT) AS chars_kept,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs_with_kept
      FROM k GROUP BY source)
SELECT b.source, paras_total, paras_kept, chars_kept, docs_with_kept
FROM b JOIN a ON b.source = a.source ORDER BY b.source
""",
)
def dedup_paragraph_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUB-DOCUMENT exact dedup — the paragraph-granular pass every
    large LLM corpus runs alongside whole-document dedup (C4 dropped
    repeated three-sentence spans, Raffel 2020; RefinedWeb/Gopher
    de-duplicate repeated lines/paragraphs across pages — boilerplate
    survives document-level MinHash because the SURROUNDING text
    differs). The corpus text carries no newline boundaries, so
    paragraphs are synthesized deterministically as consecutive 10-word
    chunks — identical segmentation in both engines — and "first
    occurrence wins" is pinned to the lexicographically smallest
    (doc_id, position).

    Spark shape, and why it holds at 100 TB: segmentation is pure array
    math inside the row (transform + slice + array_join — no explode
    until paragraphs exist, so the only row multiplication is the
    paragraph count itself); the winner per paragraph text is ONE
    map-side-combinable min(struct(doc_id, pos, source)) aggregate —
    never a window over all occurrences, never a self-join — and the
    survivor stats reduce from winner rows (distinct-paragraph-sized,
    not occurrence-sized). Two shuffles total: the winner groupBy
    (keyed by paragraph text, naturally balanced) and the final
    per-source rollup. Dedup at this granularity hashes TEXT, not
    documents, so the reduce key never skews on popular documents —
    only on genuinely repeated boilerplate, which is exactly what the
    flood the operator removes."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    d = docs.withColumn("arr", F.split("text", " ")).withColumn(
        "npar", F.ceil(F.size("arr") / F.lit(10.0)).cast("int")
    )
    paras = F.transform(
        F.sequence(F.lit(0), F.col("npar") - 1),
        lambda g: F.array_join(
            F.slice(F.col("arr"), g * F.lit(10) + 1, F.lit(10)), " "
        ),
    )
    p = d.select(
        "doc_id",
        "source",
        F.posexplode(paras).alias("pos", "para"),
    ).withColumn("pos", F.col("pos").cast("long"))
    winners = p.groupBy("para").agg(
        F.min(F.struct("doc_id", "pos", "source")).alias("w")
    )
    # per-source totals from the per-doc paragraph COUNT (npar), not the
    # exploded rows (r12): counting p re-ran the whole segmentation
    # (transform + slice + explode) a second time for a number each doc
    # already knows — sum(npar) == the exploded row count by construction
    before = d.groupBy("source").agg(
        F.sum("npar").cast("long").alias("paras_total")
    )
    after = (
        winners.select(
            F.col("w.source").alias("source"),
            F.col("w.doc_id").alias("doc_id"),
            F.length("para").alias("para_len"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("paras_kept"),
            F.sum("para_len").cast("long").alias("chars_kept"),
            F.countDistinct("doc_id").cast("long").alias("docs_with_kept"),
        )
    )
    return (
        before.join(after, "source")
        .select(
            "source", "paras_total", "paras_kept", "chars_kept",
            "docs_with_kept",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ARRAY JOIN / LEFT ARRAY JOIN
# ---------------------------------------------------------------------------


@query(
    "join_array_left",
    """
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), w -> length(w) >= 6) AS arr
  FROM documents
),
x AS (
  SELECT doc_id, source,
         unnest(CASE WHEN len(arr) = 0 THEN CAST([NULL] AS VARCHAR[])
                     ELSE arr END) AS word
  FROM d
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs_total,
       CAST(COUNT(word) AS BIGINT) AS arr_rows,
       CAST(COUNT(*) AS BIGINT) AS left_rows,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
FROM x GROUP BY source ORDER BY source
""",
)
def join_array_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ARRAY JOIN`` vs ``LEFT ARRAY JOIN`` (ClickHouse SELECT docs —
    its explode: unrolls an array column into rows, and the LEFT form
    KEEPS rows whose array is empty, emitting a default element; the
    reference's JSON-heavy analytics rows are exactly where per-message
    arrays get unrolled like this). The long-word arrays here leave some
    documents empty, so the two semantics measurably diverge: Spark's
    ``explode`` is the inner form, ``explode_outer`` the LEFT form —
    this row runs ONE explode_outer pass and derives both (count(word)
    skips the null element = inner rows; count(*) keeps it = LEFT rows;
    docs_total stays at full corpus size ONLY under LEFT semantics,
    which is the pin). Oracle emulates LEFT via the [NULL] substitution.

    Scale shape: explode multiplies rows by true element count only —
    no join, no shuffle until the final per-source rollup; generated
    columns stay inside whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    d = docs.withColumn(
        "arr",
        F.filter(F.split("text", " "), lambda w: F.length(w) >= 6),
    )
    ex = d.select(
        "doc_id", "source", F.explode_outer("arr").alias("word")
    )
    return (
        ex.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("docs_total"),
            F.count("word").cast("long").alias("arr_rows"),
            F.count(F.lit(1)).cast("long").alias("left_rows"),
            F.countDistinct("word").cast("long").alias("n_words"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# -Array combinators: aggregate over array ELEMENTS across rows
# ---------------------------------------------------------------------------


@query(
    "agg_combinators_array",
    """
WITH d AS (
  SELECT source,
         list_transform(
           list_filter(string_split(text, ' '), w -> length(w) >= 6),
           w -> length(w)) AS lens
  FROM documents
),
s AS (
  SELECT source,
         CAST(COALESCE(SUM(list_aggregate(lens, 'sum')), 0) AS BIGINT)
           AS sum_chars,
         CAST(SUM(len(lens)) AS BIGINT) AS n_elems
  FROM d GROUP BY source
),
u AS (
  SELECT source, CAST(COUNT(DISTINCT word) AS BIGINT) AS uniq_elems
  FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
                                          w -> length(w) >= 6)) AS word
        FROM documents)
  GROUP BY source
)
SELECT s.source, sum_chars, n_elems,
       CAST((100 * sum_chars) // n_elems AS BIGINT) AS avg_centichars,
       uniq_elems
FROM s JOIN u ON s.source = u.source ORDER BY s.source
""",
)
def agg_combinators_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse ``-Array`` aggregate combinator family —
    ``sumArray``, ``avgArray``, ``uniqArray`` (apply the aggregate to
    all ELEMENTS of an array column across the group's rows) — over the
    per-document long-word-length arrays. The two scale spellings,
    deliberately split: sum/avg need NO explode — ``F.aggregate``
    reduces each row's array to a scalar inside the row (JVM lambda,
    whole-stage codegen), after which the group aggregate is ordinary
    and map-side-combinable, so the shuffle never sees element
    multiplicity; uniqArray genuinely needs element identity, so it
    explodes and countDistincts — the one combinator whose cost is
    inherently element-count-shaped. Average pinned as integer
    centichars with floor division (both engines truncate positives
    identically — the r5 `//` rule)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    arr = F.filter(F.split("text", " "), lambda w: F.length(w) >= 6)
    d = docs.withColumn(
        "lens", F.transform(arr, lambda w: F.length(w))
    )
    rowred = d.select(
        "source",
        F.aggregate(
            "lens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("row_sum"),
        F.size("lens").cast("long").alias("n"),
    )
    s = rowred.groupBy("source").agg(
        F.sum("row_sum").cast("long").alias("sum_chars"),
        F.sum("n").cast("long").alias("n_elems"),
    )
    u = (
        docs.select("source", F.explode(arr).alias("word"))
        .groupBy("source")
        .agg(F.countDistinct("word").cast("long").alias("uniq_elems"))
    )
    return (
        s.join(u, "source")
        .select(
            "source",
            "sum_chars",
            "n_elems",
            F.floor(F.lit(100) * F.col("sum_chars") / F.col("n_elems"))
            .cast("long")
            .alias("avg_centichars"),
            "uniq_elems",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# -Distinct combinators: aggregate over the distinct value set
# ---------------------------------------------------------------------------


@query(
    "agg_combinators_distinct",
    """
SELECT l_returnflag AS flag,
       CAST(COUNT(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS n_distinct_qty,
       CAST(SUM(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS sum_distinct_qty,
       CAST(SUM(DISTINCT CAST(round(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS sum_distinct_cents
FROM lineitem GROUP BY l_returnflag ORDER BY flag
""",
)
def agg_combinators_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse ``-Distinct`` combinator family — ``sumDistinct``
    / ``countDistinct`` style aggregates where each distinct argument
    value contributes once (aggregate-function-combinators docs). Two
    distinct sets over DIFFERENT columns in one grouped pass is the
    interesting plan: ClickHouse keeps a hash set per (group, arg)
    inside the aggregate state; Spark/Catalyst instead rewrites
    multi-distinct into an Expand — each input row is replicated once
    per distinct set with the others nulled, then two ordinary
    hash aggregates run (partial dedup map-side first). The expansion
    factor is the number of distinct sets (2 here), constant in data
    size, and every stage remains map-side-combinable — the
    shuffle-native equivalent of per-state hash sets at 100 TB.
    Quantities are exact integers in TPC-H; prices pinned to cents."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return (
        li.groupBy("flag")
        .agg(
            F.count_distinct("qty").cast("long").alias("n_distinct_qty"),
            F.sum_distinct("qty").cast("long").alias("sum_distinct_qty"),
            F.sum_distinct("cents").cast("long").alias("sum_distinct_cents"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# OPTIMIZE TABLE ... FINAL DEDUPLICATE
# ---------------------------------------------------------------------------


@query(
    "table_optimize_dedup",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def table_optimize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``OPTIMIZE TABLE ... FINAL DEDUPLICATE`` (ClickHouse's explicit
    full-row dedup merge): ``events_dupes`` is a plain MergeTree that
    took whole-insert DOUBLE DELIVERIES (every 5th event appended twice,
    byte-identical — the at-least-once failure mode the reference
    accepts on NATS redelivery, main.go:122-127, landing in a table with
    no key semantics to upsert by), then
    plans/layout.optimize_deduplicate dropped the exact-duplicate rows
    partition-by-partition. This row reads the table PLAIN — no
    read-time dedup — and must equal the raw per-type totals: without
    the merge, n and total_cents would both run ~20% hot, so green is
    direct evidence the physical dedup removed exactly the
    double-delivered rows. Completes the dedup-flavor triptych:
    Replacing upsert (key+version), read_table_final (read-time), THIS
    (explicit full-row merge). Dedup state is bounded per partition;
    partitions rewrite independently — the 100-TB shape shared with
    every mutation in plans/layout."""
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    d = spark.read.parquet(t["events_dupes"])
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# RANGE_HASHED dictionary — dictGet with a validity-range lookup
# ---------------------------------------------------------------------------

#: (event_type, day_from, day_to, rate) — the tariff dimension with
#: per-type validity ranges; 'signup' is deliberately absent so the
#: dictGetOrDefault branch stays exercised.
_TARIFF_ROWS = (
    ("click", 20240101, 20240115, 10),
    ("click", 20240116, 20240131, 15),
    ("error", 20240101, 20240115, 20),
    ("error", 20240116, 20240131, 25),
    ("purchase", 20240101, 20240115, 30),
    ("purchase", 20240116, 20240131, 35),
    ("view", 20240101, 20240115, 40),
    ("view", 20240116, 20240131, 45),
)

_TARIFF_SQL = "), (".join(
    f"'{t}', {f}, {to}, {r}" for t, f, to, r in _TARIFF_ROWS
)


@query(
    "join_dict_range_hashed",
    f"""
WITH tariff(event_type, day_from, day_to, rate) AS (
  VALUES ({_TARIFF_SQL})
),
e AS (
  SELECT event_type, CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(COALESCE(t.rate, 0)) AS BIGINT) AS rate_sum,
       CAST(SUM(COALESCE(t.rate, 0) * e.cents) AS BIGINT) AS charge_cents
FROM e LEFT JOIN tariff t
  ON e.event_type = t.event_type AND e.day BETWEEN t.day_from AND t.day_to
GROUP BY e.event_type ORDER BY e.event_type
""",
)
def join_dict_range_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE_HASHED dictionary lookups — ``dictGetOrDefault('tariff',
    'rate', type, day)`` where the dictionary layout keys each attribute
    by (key, validity range) and the lookup matches the range covering
    the probe point (ClickHouse external-dictionary LAYOUT(RANGE_HASHED)
    docs; the standard shape for slowly-changing tariffs/rates joined to
    fact timestamps). Completes the dictionary story next to
    join_dict_get (flat/hashed layouts) and join_dict_hierarchy
    (dictGetHierarchy): here each fact row picks THE one dimension row
    whose [day_from, day_to] covers its day, with the OrDefault branch
    live ('signup' has no tariff -> rate 0).

    Spark shape: the dictionary is an in-plan literal dimension,
    BROADCAST and equi-joined on the hash key (event_type) with the
    range as a join residual — a BroadcastHashJoin, never a shuffle and
    never a nested loop, because the equi half carries the join; ranges
    per key are few (2 here) so the residual scan is O(1). At 100 TB
    the fact side streams map-side, exactly like every dictGet analog
    in this engine. All money integer cents."""
    dim = spark.createDataFrame(
        list(_TARIFF_ROWS),
        "event_type string, day_from long, day_to long, rate long",
    )
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyyMMdd").cast("long").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    j = e.join(
        F.broadcast(bounded(dim, "tariff dictionary literal").withColumnRenamed("event_type", "t_type")),
        (e["event_type"] == F.col("t_type"))
        & F.col("day").between(F.col("day_from"), F.col("day_to")),
        "left",
    )
    rate = F.coalesce(F.col("rate"), F.lit(0))
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(rate).cast("long").alias("rate_sum"),
            F.sum(rate * F.col("cents")).cast("long").alias("charge_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# GDPR erasure of the CASCADE warehouse itself
# ---------------------------------------------------------------------------


def _cascade_erased_oracle() -> str:
    from go_nats_to_clickhouse_spark.plans.materialize import (
        ERASE_MOD,
        NEW_SOURCES,
    )

    src = ", ".join(f"'{s}'" for s in NEW_SOURCES)
    return f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_msgs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars_stored,
       CAST(0 AS BIGINT) AS erased_present
FROM documents
WHERE source IN ({src}) AND doc_id % {ERASE_MOD} <> 0
GROUP BY source ORDER BY source
"""


@query("pipeline_cascade_erased", _cascade_erased_oracle())
def pipeline_cascade_erased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure of the REFERENCE-SHAPED warehouse itself
    (plans/materialize.cascade_erased_tables): the erase story's other
    half. The index/ANN erasures repaired what the ENGINE derived; this
    cell scrubs what the reference's own tables STORE — the per-stream
    raw tables, the union table, and the analytics MV target written by
    the composed service still held the erased documents' full text and
    metadata until the ``ALTER TABLE ... DELETE`` pass
    (plans/layout.erase_where) removed every message routed for an
    erase-set entity, document AND embedding twins, across all three
    tables (init.sql:8-121's MergeTree set — one logical erasure, three
    physical tables, because that is what the MV cascade multiplied the
    insert into).

    This row reads the scrubbed analytics table PLAIN: per corpus
    source, the surviving message count and the total stored characters
    (content-level evidence: the erased texts' bytes are gone, not just
    their ids), plus the in-table count of erase-set rows — pinned 0 by
    the never-ingested oracle, which recomputes everything from a world
    where the erased docs were never published. Raw/union/analytics
    agreement and the vector-twin scrub are pinned in tests; the erase
    itself is a service_health maintenance row like every other flavor.

    Scale shape: the mutation probed each leaf partition with a
    column-pruned count and rewrote only leaves holding matches —
    at 100 TB an erase touching one month of one stream rewrites
    exactly that leaf."""
    import os as _os

    from go_nats_to_clickhouse_spark.plans.materialize import (
        ERASE_MOD,
        NEW_SOURCES,
        cascade_erased_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import ANALYTICS_TABLE

    t = cascade_erased_tables(spark, sf_dir)
    ana = spark.read.parquet(_os.path.join(t["warehouse"], ANALYTICS_TABLE))
    return (
        ana.filter(F.col("project_code").isin(*NEW_SOURCES))
        .groupBy(F.col("project_code").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_msgs"),
            F.sum(F.length("message_text")).cast("long").alias(
                "n_chars_stored"
            ),
            F.sum(
                F.when(
                    F.pmod(F.col("message_id").cast("long"), F.lit(ERASE_MOD))
                    == 0,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("erased_present"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ADD COLUMN DEFAULT / MATERIALIZE COLUMN
# ---------------------------------------------------------------------------


@query(
    "table_materialized_column",
    """
SELECT CAST(CAST(round(value * 100) AS BIGINT) // 1000 AS BIGINT)
         AS value_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY value_bucket ORDER BY value_bucket
""",
)
def table_materialized_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE ... ADD COLUMN value_bucket Int64 DEFAULT
    floor(value_cents / 1000)`` — ClickHouse's instant schema evolution:
    the new column is queryable IMMEDIATELY on a 100 TB table because
    old parts compute the DEFAULT expression at read time while only
    parts written after the ALTER store it physically (and
    ``MATERIALIZE COLUMN`` later rewrites old parts to close the gap).
    ``events_addcol`` is split exactly that way — the first half of its
    day partitions predates the column, the second half stores it — and
    this row reads it through plans/layout.read_with_default (a
    schema-merging scan + coalesce(stored, default), whole-stage
    codegen, zero rewrite): the bucket histogram must be IDENTICAL to
    computing the expression over raw events, proving the stored and
    computed halves agree seamlessly. The materialization half —
    part-rewrite confined to column-less partitions, already-physical
    partitions byte-untouched, plain read == default read afterwards —
    is pinned in tests. Buckets are integer floor division, identical
    in both engines for non-negative cents."""
    from go_nats_to_clickhouse_spark.plans.layout import read_with_default
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    df = read_with_default(
        spark,
        t["events_addcol"],
        "value_bucket",
        F.floor(F.col("value_cents") / F.lit(1000)).cast("long"),
    )
    return (
        df.groupBy(F.col("value_bucket").cast("long").alias("value_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("value_bucket")
    )


@query("pipeline_cascade_erased_live", _cascade_erased_oracle())
def pipeline_cascade_erased_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The cascade GDPR scrub executed WHILE the reference-shaped ingest
    service is LIVE (plans/materialize.cascade_erased_live_tables): the
    ``ALTER TABLE ... DELETE`` pass over raw/union/analytics ran between
    micro-batches of a running ``start_pipeline`` query, and post-erase
    envelopes appended against the scrubbed tables — ClickHouse's
    mutations-concurrent-with-inserts MergeTree semantics (init.sql:17)
    reproduced over the exact table set the reference's own loop
    maintains. Same never-ingested oracle as the stop-then-erase cell
    (pipeline_cascade_erased): green on BOTH proves the cascade scrub is
    insensitive to whether the service was stopped — the erase x live
    matrix now covers every sink family (doc index erl-, ANN erlv-,
    cascade cel-). Reads one narrow projection of the final analytics
    table; erased-entity absence across all three tables, phase-B
    arrival, and the service_health maintenance row are pinned in
    tests."""
    import os as _os

    from go_nats_to_clickhouse_spark.plans.materialize import (
        ERASE_MOD,
        NEW_SOURCES,
        cascade_erased_live_tables,
    )
    from go_nats_to_clickhouse_spark.streaming.pipeline import ANALYTICS_TABLE

    t = cascade_erased_live_tables(spark, sf_dir)
    ana = spark.read.parquet(_os.path.join(t["warehouse"], ANALYTICS_TABLE))
    return (
        ana.filter(F.col("project_code").isin(*NEW_SOURCES))
        .groupBy(F.col("project_code").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_msgs"),
            F.sum(F.length("message_text")).cast("long").alias(
                "n_chars_stored"
            ),
            F.sum(
                F.when(
                    F.pmod(F.col("message_id").cast("long"), F.lit(ERASE_MOD))
                    == 0,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("erased_present"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# system.parts — introspection from parquet footers only
# ---------------------------------------------------------------------------


@query(
    "table_parts_report",
    """
SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS part,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(event_id) AS BIGINT) AS min_event_id,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events GROUP BY part ORDER BY part
""",
)
def table_parts_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``system.parts`` (ClickHouse's part-introspection table — the ops
    surface every MergeTree deployment watches, and the reference's
    operators would query on day one): per partition of the
    day-partitioned ``events_mutated`` table, row counts and the
    min/max statistics of the primary-key column — computed from
    PARQUET FOOTERS ONLY (plans/layout.parts_report; zero data pages
    read, O(files) metadata probes — on 100 TB this is a metastore
    query, exactly what system.parts is). The oracle recomputes
    count/min/max FROM THE DATA, so green is a direct proof that the
    footer statistics the scan planner skips granules by are exactly
    true — the foundation under every ORDER-BY data-skipping claim in
    the layout module — and that the mutation machinery this table went
    through (an ALTER UPDATE part-rewrite) preserved honest statistics.
    File counts ride in the report for ops but stay out of the driver
    row (write-parallelism-dependent, not data-derivable)."""
    from go_nats_to_clickhouse_spark.plans.layout import parts_report
    from go_nats_to_clickhouse_spark.plans.materialize import tmaint_tables

    t = tmaint_tables(spark, sf_dir)
    return (
        parts_report(spark, t["events_mutated"], "event_id")
        .select("part", "n_rows", "min_event_id", "max_event_id")
        .orderBy("part")
    )


# ---------------------------------------------------------------------------
# GROUP BY ... WITH TOTALS (default totals_mode = before_having)
# ---------------------------------------------------------------------------


@query(
    "agg_with_totals",
    """
WITH g AS (
  SELECT event_type,
         CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n, total_cents FROM g
WHERE 200 * n >= (SELECT COUNT(*) FROM events)
UNION ALL
SELECT 'TOTALS' AS event_type, CAST(0 AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
ORDER BY event_type, day
""",
)
def agg_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ... WITH TOTALS`` with its DEFAULT ``totals_mode =
    before_having`` — the ClickHouse semantic worth pinning explicitly
    (SELECT docs, WITH TOTALS modifier): the totals row is computed
    over ALL input rows, INCLUDING groups a HAVING clause then drops —
    so when small groups are filtered out, totals deliberately exceed
    the sum of the surviving groups (the modes after_having_* exist
    precisely because this surprises people; the default is what the
    reference's consumers would get). Rendered tabularly with the
    'TOTALS' sentinel key standing in for ClickHouse's separate totals
    block. Spark spelling: the grouped aggregate + HAVING filter,
    unioned with one global aggregate over the unfiltered input.

    Shape (r12 optimization): the totals row AND the HAVING threshold
    are exact integer re-aggregations of the (type, day) groups (group
    counts partition the input, so SUM(n) == COUNT(*) and
    SUM(total_cents) == the global cents sum), so everything derives
    from ONE grouped pass — the previous spelling paid a separate
    driver-side count() action (a full pass before the query ran) plus
    a second full-scan global aggregate. The grand-total subtree is a
    1-row group-less aggregate (broadcast-legal by construction) reused
    by both the threshold crossJoin and the TOTALS row."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyyMMdd").cast("long").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    g = e.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    # coalesce matches COUNT(*) = 0 (not SUM's NULL) on an empty input
    tot_row = g.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("tn"),
        F.sum("total_cents").cast("long").alias("tc"),
    )
    groups = (
        g.crossJoin(F.broadcast(tot_row))
        .filter(F.lit(200) * F.col("n") >= F.col("tn"))
        .select("event_type", "day", "n", "total_cents")
    )
    totals = tot_row.select(
        F.lit("TOTALS").alias("event_type"),
        F.lit(0).cast("long").alias("day"),
        F.col("tn").alias("n"),
        F.col("tc").alias("total_cents"),
    )
    return groups.unionByName(totals).orderBy("event_type", "day")
