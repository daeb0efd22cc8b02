"""Round-3 ClickHouse-analog widening: IP & encoding scalar families, the
weighted exact quantile, and a windowFunnel behavioral analog.

The reference delegates its whole ad-hoc surface to ClickHouse
(SURVEY.md §2.7); these cover ClickHouse families the registry did
not yet exercise:

* IPv4 functions (``IPv4StringToNum`` / ``IPv4NumToString`` /
  ``isIPv4String`` / CIDR) — init.sql keeps addresses as raw strings, so
  parsing stays query-side, all codegen expressions.
* encoding functions (``hex`` / ``unhex`` / ``base64Encode`` /
  ``base64Decode``) — round-trip proofs, map-only.
* ``quantileExactWeighted`` — Spark's exact ``percentile`` with its
  frequency argument; the oracle replays the weighted multiset by lateral
  expansion.
* ``windowFunnel(3600)`` — deepest view→click→purchase chain within one
  hour of the entry view, built ON the bucketized ``range_join`` operator
  (the scalable point-in-interval shape), not a per-row subquery.
* ``exponentialTimeDecayedSum/Avg`` — telescoped into one running window
  sum (no history self-join).
* ``sequenceCount('(?1)(?2)')`` — the greedy automaton collapsed to a
  stateless lag expression.
* ``groupBitmap`` cardinalities (AND/OR set algebra) — membership flags
  through a partial aggregate instead of serialized bitmaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.operators.hints import bounded

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.schemas import load_table


@query(
    "scalar_ip_functions",
    """
WITH ips AS (
  SELECT event_id,
         concat(CASE WHEN user_id % 2 = 0 THEN '10' ELSE '203' END, '.',
                CAST(user_id % 256 AS VARCHAR), '.',
                CAST((event_id // 256) % 256 AS VARCHAR), '.',
                CAST(event_id % 256 AS VARCHAR)) AS ip
  FROM events WHERE event_id < 2000
),
octets AS (
  SELECT event_id, ip,
         CAST(split_part(ip, '.', 1) AS BIGINT) AS a,
         CAST(split_part(ip, '.', 2) AS BIGINT) AS b,
         CAST(split_part(ip, '.', 3) AS BIGINT) AS c,
         CAST(split_part(ip, '.', 4) AS BIGINT) AS d
  FROM ips
)
SELECT event_id, ip,
       a * 16777216 + b * 65536 + c * 256 + d AS ip_num,
       concat(CAST(a AS VARCHAR), '.', CAST(b AS VARCHAR), '.',
              CAST(c AS VARCHAR), '.', CAST(d AS VARCHAR)) AS ip_roundtrip,
       (a = 10) OR (a = 192 AND b = 168) OR (a = 172 AND b BETWEEN 16 AND 31)
         AS is_private,
       concat(CAST(a AS VARCHAR), '.', CAST(b AS VARCHAR), '.',
              CAST(c AS VARCHAR), '.0/24') AS cidr24
FROM octets
ORDER BY event_id
""",
)
def scalar_ip_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4 family (``IPv4StringToNum``, ``IPv4NumToString``,
    ``isIPv4String``-style private-range check, ``IPv4CIDRToRange``) over
    an address synthesized from event columns. Everything is a codegen
    expression over ``split`` — no UDF, no shuffle; the oracle re-derives
    the same arithmetic from ``split_part``."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    ip = F.concat_ws(
        ".",
        F.when(F.col("user_id") % 2 == 0, F.lit("10")).otherwise(F.lit("203")),
        (F.col("user_id") % 256).cast("string"),
        ((F.col("event_id") / 256).cast("long") % 256).cast("string"),
        (F.col("event_id") % 256).cast("string"),
    )
    ipd = e.select("event_id", ip.alias("ip"))
    oct_ = F.split(F.col("ip"), r"\.")
    a = oct_.getItem(0).cast("long")
    b = oct_.getItem(1).cast("long")
    c = oct_.getItem(2).cast("long")
    d = oct_.getItem(3).cast("long")
    return (
        ipd.select(
            "event_id",
            "ip",
            (a * 16777216 + b * 65536 + c * 256 + d).alias("ip_num"),
            F.concat_ws(
                ".",
                a.cast("string"),
                b.cast("string"),
                c.cast("string"),
                d.cast("string"),
            ).alias("ip_roundtrip"),
            (
                (a == 10)
                | ((a == 192) & (b == 168))
                | ((a == 172) & b.between(16, 31))
            ).alias("is_private"),
            F.concat(
                F.concat_ws(".", a.cast("string"), b.cast("string"), c.cast("string")),
                F.lit(".0/24"),
            ).alias("cidr24"),
        )
        .orderBy("event_id")
    )


@query(
    "scalar_encoding_functions",
    """
SELECT doc_id,
       hex(source) AS hex_source,
       decode(unhex(hex(source))) = source AS hex_roundtrip_ok,
       base64(CAST(lang AS BLOB)) AS b64_lang,
       decode(from_base64(base64(CAST(lang AS BLOB)))) = lang AS b64_roundtrip_ok,
       CAST(octet_length(CAST(source AS BLOB)) AS INT) AS source_bytes
FROM documents
ORDER BY doc_id
""",
)
def scalar_encoding_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse encoding family (``hex``/``unhex``, ``base64Encode``/
    ``base64Decode``) with round-trip proofs. Map-only codegen; Spark and
    DuckDB must agree on the exact hex casing and base64 alphabet for the
    value hash to match, which is the point of the oracle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.hex(F.col("source")).alias("hex_source"),
            (F.decode(F.unhex(F.hex(F.col("source"))), "UTF-8") == F.col("source"))
            .alias("hex_roundtrip_ok"),
            F.base64(F.col("lang").cast("binary")).alias("b64_lang"),
            (
                F.decode(F.unbase64(F.base64(F.col("lang").cast("binary"))), "UTF-8")
                == F.col("lang")
            ).alias("b64_roundtrip_ok"),
            F.octet_length(F.col("source")).cast("int").alias("source_bytes"),
        )
        .orderBy("doc_id")
    )


@query(
    "agg_quantile_exact_weighted",
    """
SELECT l_returnflag,
       CAST(round(quantile_cont(l_quantity, 0.5), 6) AS DOUBLE) AS wmedian,
       CAST(round(quantile_cont(l_quantity, 0.9), 6) AS DOUBLE) AS wp90
FROM (SELECT l_returnflag, l_quantity
      FROM lineitem, unnest(range(1, CAST(l_linenumber AS INT) + 1)))
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_quantile_exact_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(q)(x, w)`` analog: Spark's exact
    ``percentile`` aggregate takes a frequency column directly, so the
    weighted multiset never materializes — weights ride the partial
    aggregate through the shuffle (O(distinct values) state, not O(sum of
    weights)). The oracle proves the semantics by physically expanding
    each row ``weight`` times and taking the continuous quantile."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(
                F.expr("percentile(l_quantity, 0.5, l_linenumber)"), 6
            ).alias("wmedian"),
            F.round(
                F.expr("percentile(l_quantity, 0.9, l_linenumber)"), 6
            ).alias("wp90"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "window_funnel_depth",
    """
WITH views AS (
  SELECT event_id AS vid, user_id AS v_user, ts AS vts
  FROM events WHERE event_type = 'view'
),
in_window AS (
  SELECT v.vid, v.v_user, v.vts, e.event_type, e.ts
  FROM views v
  JOIN events e
    ON e.user_id = v.v_user AND e.ts > v.vts
   AND e.ts <= v.vts + INTERVAL 1 HOUR
   AND e.event_type IN ('click', 'purchase')
),
per_view AS (
  SELECT vid, v_user,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
  FROM in_window
  GROUP BY vid, v_user
),
depth_per_view AS (
  SELECT v.v_user,
         1 + CASE WHEN p.first_click IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN p.first_click IS NOT NULL
                   AND p.last_purchase > p.first_click THEN 1 ELSE 0 END
           AS depth
  FROM views v LEFT JOIN per_view p ON v.vid = p.vid
)
SELECT v_user AS user_id, CAST(max(depth) AS INT) AS funnel_depth
FROM depth_per_view
GROUP BY v_user
ORDER BY user_id
""",
)
def window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(3600)(ts, view, click, purchase)`` analog:
    per user, the deepest view -> click -> purchase chain where every later
    step lands within one hour of the entry view (a click exists strictly
    after the view, and a purchase strictly after that click, inside the
    window; ``min(click) < max(purchase)`` within the window is equivalent
    to "some click precedes some purchase").

    Scale shape: the per-view hour window is a point-in-interval problem,
    so it runs on the bucketized ``range_join`` operator with ``user_id``
    as an extra equi key — a shuffle equi-join on (bucket, user), never a
    per-row subquery or nested loop."""
    from go_nats_to_clickhouse_spark.operators.range_join import range_join

    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("vts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("vend"),
    )
    steps = e.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("user_id").alias("s_user"),
        F.col("event_type").alias("s_type"),
        F.col("ts").alias("s_ts"),
    )
    hits = range_join(
        steps,
        views,
        point="s_ts",
        start="vts",
        end="vend",
        bucket_width=3600,
        closed="right",  # (vts, vts + 1h]: strictly after the view
        equi=[("s_user", "v_user")],
    )
    per_view = hits.groupBy("vid", "v_user").agg(
        F.min(F.when(F.col("s_type") == "click", F.col("s_ts"))).alias("first_click"),
        F.max(F.when(F.col("s_type") == "purchase", F.col("s_ts"))).alias(
            "last_purchase"
        ),
    )
    depth = (
        views.join(per_view, ["vid", "v_user"], "left")
        .select(
            "v_user",
            (
                F.lit(1)
                + F.when(F.col("first_click").isNotNull(), 1).otherwise(0)
                + F.when(
                    F.col("first_click").isNotNull()
                    & (F.col("last_purchase") > F.col("first_click")),
                    1,
                ).otherwise(0)
            ).alias("depth"),
        )
    )
    return (
        depth.groupBy(F.col("v_user").alias("user_id"))
        .agg(F.max("depth").cast("int").alias("funnel_depth"))
        .orderBy("user_id")
    )


@query(
    "agg_time_decayed_avg",
    """
WITH t0 AS (
  SELECT user_id, ts, event_id, value,
         epoch_us(ts) / 1000000.0
           - min(epoch_us(ts) / 1000000.0) OVER (PARTITION BY user_id) AS trel
  FROM events WHERE user_id < 200
),
acc AS (
  SELECT user_id, ts, trel,
         sum(value * exp(trel / 86400.0))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS wsum,
         sum(exp(trel / 86400.0))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS wcnt
  FROM t0
)
SELECT user_id, ts,
       CAST(round(exp(-trel / 86400.0) * wsum, 6) AS DOUBLE) AS decayed_sum,
       CAST(round((exp(-trel / 86400.0) * wsum)
                  / (exp(-trel / 86400.0) * wcnt), 6) AS DOUBLE) AS decayed_avg
FROM acc
ORDER BY user_id, ts
""",
)
def agg_time_decayed_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedSum/Avg(tau)(v, t)`` analog with
    a one-day time constant: every prior event's value decays by
    ``exp(-(t_i - t_j)/tau)``.

    Spark-first trick: the decayed sum telescopes —
    ``exp(-t_i/tau) * running_sum(v_j * exp(t_j/tau))`` — so the whole
    operator is ONE running window sum plus map-side exponentials (no
    self-join over history, no UDF). Timestamps are re-based per user
    (t - min(t)) to keep ``exp(t/tau)`` inside double range; both engines
    accumulate left-to-right in the same order, so results agree bit-for-
    bit before the 6-dp rounding."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    from pyspark.sql.window import Window

    tau = 86400.0
    wuser = Window.partitionBy("user_id")
    # unix_micros / 1e6, NOT unix_timestamp: the latter truncates to whole
    # seconds while the oracle's epoch keeps the microsecond fraction, and
    # a sub-second disagreement in t feeds straight into exp(t/tau).
    tsec = F.unix_micros("ts").cast("double") / F.lit(1000000.0)
    t0 = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        (tsec - F.min(tsec).over(wuser)).alias("trel"),
    )
    # event_id tiebreak (not trel, which is a pure function of ts and breaks
    # no ties): duplicate (user_id, ts) rows would otherwise make the
    # running-sum accumulation order engine-dependent.
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    acc = t0.select(
        "user_id",
        "ts",
        "trel",
        F.sum(F.col("value") * F.exp(F.col("trel") / tau)).over(wrun).alias("wsum"),
        F.sum(F.exp(F.col("trel") / tau)).over(wrun).alias("wcnt"),
    )
    decay = F.exp(-F.col("trel") / tau)
    return acc.select(
        "user_id",
        "ts",
        F.round(decay * F.col("wsum"), 6).alias("decayed_sum"),
        F.round((decay * F.col("wsum")) / (decay * F.col("wcnt")), 6).alias(
            "decayed_avg"
        ),
    ).orderBy("user_id", "ts")


@query(
    "agg_sequence_count",
    """
WITH vp AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events WHERE event_type IN ('view', 'purchase')
)
SELECT user_id,
       CAST(count(CASE WHEN event_type = 'purchase' AND prev_type = 'view'
                       THEN 1 END) AS BIGINT) AS n_sequences
FROM vp
GROUP BY user_id
ORDER BY user_id
""",
)
def agg_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1)(?2)')(ts, view, purchase)`` analog:
    how many non-overlapping view -> purchase chains per user (greedy
    left-to-right matching, adjacent steps).

    The greedy automaton collapses to a stateless window expression: over
    the view/purchase subsequence in time order, each purchase whose
    IMMEDIATELY preceding row is a view closes exactly one chain (a
    maximal V-block followed by a P-block contributes one match), so the
    count is ``count(cur = P and lag = V)`` — one shuffle, no iteration,
    no UDF."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vp = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        vp.groupBy("user_id")
        .agg(
            F.count(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("prev_type") == "view"),
                    1,
                )
            ).alias("n_sequences")
        )
        .orderBy("user_id")
    )


@query(
    "agg_bitmap_cardinalities",
    """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
  FROM events
  GROUP BY user_id
)
SELECT CAST(sum(has_click) AS BIGINT) AS click_users,
       CAST(sum(has_purchase) AS BIGINT) AS purchase_users,
       CAST(sum(has_click * has_purchase) AS BIGINT) AS and_users,
       CAST(sum(CASE WHEN has_click = 1 OR has_purchase = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS or_users
FROM per_user
""",
)
def agg_bitmap_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitmap`` family analog (``bitmapCardinality``,
    ``bitmapAndCardinality``, ``bitmapOrCardinality`` over per-event-type
    user-id bitmaps). Spark-first shape: the bitmap IS the distinct-key
    set, so one partial-aggregating groupBy produces per-user membership
    flags and a second map-side sum folds the set algebra — two shuffles
    total, cardinality-bounded state, no serialized bitmap blobs."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "has_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_purchase"
        ),
    )
    return per_user.agg(
        F.sum("has_click").cast("long").alias("click_users"),
        F.sum("has_purchase").cast("long").alias("purchase_users"),
        F.sum(F.col("has_click") * F.col("has_purchase"))
        .cast("long")
        .alias("and_users"),
        F.sum(
            F.when((F.col("has_click") == 1) | (F.col("has_purchase") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("or_users"),
    )


@query(
    "scalar_geo_functions",
    """
WITH pts AS (
  SELECT event_id,
         -60.0 + (user_id % 120) * 1.0 + (event_id % 97) / 97.0 AS lat,
         -180.0 + ((event_id * 7) % 360) * 1.0 + (event_id % 89) / 89.0 AS lon
  FROM events WHERE event_id < 2000
)
SELECT event_id,
       CAST(round(lat, 6) AS DOUBLE) AS lat,
       CAST(round(lon, 6) AS DOUBLE) AS lon,
       CAST(round(
         2 * 6371000.0 * asin(sqrt(
           pow(sin(radians(lat - 52.52) / 2), 2)
           + cos(radians(52.52)) * cos(radians(lat))
             * pow(sin(radians(lon - 13.405) / 2), 2)
         )) / 1000.0, 1) AS DOUBLE) AS km_to_berlin,
       lat BETWEEN 35.0 AND 71.0 AND lon BETWEEN -10.0 AND 40.0
         AS in_europe_bbox,
       CAST(floor((lon + 180.0) / 30.0) * 12
            + floor((lat + 90.0) / 15.0) AS BIGINT) AS geocell
FROM pts
ORDER BY event_id
""",
)
def scalar_geo_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse geo family analog (``greatCircleDistance`` via haversine,
    ``pointInPolygon``-style bounding box, ``geohashEncode``-style integer
    cell id) over coordinates synthesized from event columns. All codegen
    trig/arithmetic — no UDF, no shuffle; distance rounded to 0.1 km so
    the value hash tolerates last-ulp libm differences between engines."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    lat = (
        F.lit(-60.0)
        + (F.col("user_id") % 120).cast("double")
        + (F.col("event_id") % 97).cast("double") / 97.0
    )
    lon = (
        F.lit(-180.0)
        + ((F.col("event_id") * 7) % 360).cast("double")
        + (F.col("event_id") % 89).cast("double") / 89.0
    )
    pts = e.select("event_id", lat.alias("lat"), lon.alias("lon"))
    dlat = F.radians(F.col("lat") - 52.52) / 2
    dlon = F.radians(F.col("lon") - 13.405) / 2
    hav = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(F.lit(52.52)))
        * F.cos(F.radians(F.col("lat")))
        * F.pow(F.sin(dlon), 2)
    )
    km = 2 * 6371000.0 * F.asin(F.sqrt(hav)) / 1000.0
    return pts.select(
        "event_id",
        F.round(F.col("lat"), 6).alias("lat"),
        F.round(F.col("lon"), 6).alias("lon"),
        F.round(km, 1).alias("km_to_berlin"),
        (
            F.col("lat").between(35.0, 71.0) & F.col("lon").between(-10.0, 40.0)
        ).alias("in_europe_bbox"),
        (
            F.floor((F.col("lon") + 180.0) / 30.0) * 12
            + F.floor((F.col("lat") + 90.0) / 15.0)
        )
        .cast("long")
        .alias("geocell"),
    ).orderBy("event_id")


def _incremental_oracle() -> str:
    from go_nats_to_clickhouse_spark.queries.text import _mh_mins_sql

    mins = _mh_mins_sql(16)
    sig_list = ", ".join(f"m{s}" for s in range(16))
    return f"""
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
based AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS base FROM sh
),
mh AS (
  SELECT doc_id,
         {mins}
  FROM based
  GROUP BY doc_id
),
sig AS (SELECT doc_id, [{sig_list}] AS sig FROM mh),
bands AS (
  SELECT doc_id, band,
         md5(array_to_string(list_transform(range(1, 5),
             r -> CAST(sig[band * 4 + r] AS VARCHAR)), '-')) AS bucket
  FROM sig, UNNEST(range(4)) AS t(band)
),
new_ids AS (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1')),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
  FROM bands n
  JOIN new_ids ni ON ni.doc_id = n.doc_id
  JOIN bands c ON c.band = n.band AND c.bucket = n.bucket
  WHERE c.doc_id NOT IN (SELECT doc_id FROM new_ids)
)
SELECT new_id, corpus_id,
  ROUND(list_sum(list_transform(range(1, 17),
        i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0, 6)
    AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = new_id
JOIN sig sb ON sb.doc_id = corpus_id
"""


@query("dedup_incremental_new_batch", _incremental_oracle())
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a small NEW batch (sources src0/src1) is
    checked against the EXISTING corpus (every other source) for near-dup
    collisions — the per-batch production shape where the corpus is 100 TB
    and static and only the batch is fresh. The corpus band table acts as
    the persistable index; the bucket join broadcasts the new side so the
    corpus never shuffles for candidate generation
    (operators/dedup.incremental_lsh_pairs)."""
    from go_nats_to_clickhouse_spark.operators.dedup import incremental_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    is_new = F.col("source").isin("src0", "src1")
    return incremental_lsh_pairs(
        d.filter(is_new), d.filter(~is_new), num_hashes=16, bands=4, shingle_n=3
    )


@query(
    "scalar_rounding_functions",
    """
SELECT l_orderkey, l_linenumber,
       CAST(round_even(l_extendedprice / 128.0, 1) AS DOUBLE) AS bankers_1dp,
       CAST(pow(2, floor(log2(l_extendedprice))) AS DOUBLE) AS to_exp2,
       CAST(CASE
         WHEN l_quantity < 1 THEN 0 WHEN l_quantity < 10 THEN 1
         WHEN l_quantity < 30 THEN 10 WHEN l_quantity < 60 THEN 30
         ELSE 60 END AS BIGINT) AS duration_bucket,
       printf('%.2f KiB', floor(l_extendedprice / 1024.0 * 100) / 100)
         AS readable_size
FROM lineitem
WHERE l_orderkey < 400
ORDER BY l_orderkey, l_linenumber
""",
)
def scalar_rounding_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse rounding family (``roundBankers``, ``roundToExp2``,
    ``roundDuration``-style bucket ladder, ``formatReadableSize``-style
    rendering). ``bround`` is Spark's banker's rounding (HALF_EVEN) and
    must agree with DuckDB's ``round_even`` on the same doubles; the rest
    are pure expression ladders."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            # /128 (exact binary shift), NOT /100: a 2-dp price over 100
            # can land at a decimal .x5 tie whose nearest double sits just
            # off it — Spark's bround judges the tie on the shortest
            # decimal repr while DuckDB's round_even judges the binary
            # value, and they disagree (565.45 -> 565.4 vs 565.5). After
            # /128 the only representable 1-dp ties are exact binary
            # quarters, which both engines see identically.
            F.bround(F.col("l_extendedprice") / 128.0, 1).alias("bankers_1dp"),
            F.pow(F.lit(2.0), F.floor(F.log2("l_extendedprice"))).alias("to_exp2"),
            F.when(F.col("l_quantity") < 1, 0)
            .when(F.col("l_quantity") < 10, 1)
            .when(F.col("l_quantity") < 30, 10)
            .when(F.col("l_quantity") < 60, 30)
            .otherwise(60)
            .cast("long")
            .alias("duration_bucket"),
            # floor to 2dp BEFORE formatting: printf's own half-rounding
            # differs between the JVM (HALF_UP on the decimal expansion)
            # and C (half-even on the binary value); floor is exact on the
            # same double in both engines, so the formatted string agrees.
            F.format_string(
                "%.2f KiB",
                F.floor(F.col("l_extendedprice") / 1024.0 * 100) / 100,
            ).alias("readable_size"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "agg_cramers_v",
    """
WITH cells AS (
  SELECT event_type AS a, dayofweek(ts) AS b, CAST(count(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT a, b, o,
         sum(o) OVER (PARTITION BY a) AS row_tot,
         sum(o) OVER (PARTITION BY b) AS col_tot,
         sum(o) OVER () AS n
  FROM cells
),
chi AS (
  SELECT sum(pow(o - row_tot * col_tot / n, 2) / (row_tot * col_tot / n)) AS chi2,
         max(n) AS n,
         count(DISTINCT a) AS r,
         count(DISTINCT b) AS c
  FROM margins
)
SELECT CAST(round(sqrt(chi2 / (n * (least(r, c) - 1))), 6) AS DOUBLE) AS cramers_v
FROM chi
""",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersV(a, b)`` analog: association between event type
    and day-of-week, computed exactly from the contingency table — one
    groupBy for cell counts (the only full-data shuffle), window margins
    over the tiny cell table, then the chi-square fold. No sampling, no
    UDF; integer counts make the float fold deterministic across engines
    before the 6-dp rounding."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    cells = e.groupBy(
        F.col("event_type").alias("a"), F.dayofweek("ts").alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    m = cells.select(
        "a",
        "b",
        "o",
        F.sum("o").over(Window.partitionBy("a")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("b")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi = m.agg(
        F.sum(F.pow(F.col("o") - expected, 2) / expected).alias("chi2"),
        F.max("n").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    return chi.select(
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1))), 6
        ).alias("cramers_v")
    )


@query(
    "join_dict_get",
    """
SELECT o.o_orderkey,
       coalesce(n.n_name, 'UNKNOWN') AS cust_nation,
       coalesce(r.r_name, 'UNKNOWN') AS cust_region
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE o.o_orderkey < 2000
ORDER BY o.o_orderkey
""",
)
def join_dict_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse dictionary-function analog (``dictGet`` /
    ``dictGetOrDefault`` over a hierarchy: customer -> nation -> region).
    CH dictionaries are in-RAM replicated lookup tables; the Spark-first
    equivalent is a BROADCAST left join per dictionary level with
    ``coalesce`` supplying the dictGetOrDefault fallback — the dimension
    ships to every executor once, the fact side never shuffles for the
    lookups."""
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(broadcast(bounded(c, "clickhouse dictionary contract: replicated fully in RAM")), F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"), "left")
        .join(broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"), "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("cust_nation"),
            F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("cust_region"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_uuid_functions",
    """
WITH u AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
),
fmt AS (
  SELECT doc_id,
         concat(substr(h, 1, 8), '-', substr(h, 9, 4), '-',
                substr(h, 13, 4), '-', substr(h, 17, 4), '-',
                substr(h, 21, 12)) AS uuid
  FROM u
)
SELECT doc_id, uuid,
       ('0x' || substr(replace(uuid, '-', ''), 1, 15))::BIGINT AS uuid_hi60,
       substr(uuid, 15, 1) AS version_nibble,
       length(replace(uuid, '-', '')) = 32 AS roundtrip_ok
FROM fmt
ORDER BY doc_id
""",
)
def scalar_uuid_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse UUID family analog (``UUIDStringToNum``/``UUIDNumToString``
    formatting, version-nibble extraction) over md5-derived deterministic
    UUIDs. Pure string codegen; the 60-bit numeric form reuses the
    engine-portable hex-to-BIGINT trick from the dedup operators."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    uuid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    u = d.select("doc_id", uuid.alias("uuid"))
    bare = F.regexp_replace(F.col("uuid"), "-", "")
    return (
        u.select(
            "doc_id",
            "uuid",
            F.conv(F.substring(bare, 1, 15), 16, 10).cast("long").alias("uuid_hi60"),
            F.substring(F.col("uuid"), 15, 1).alias("version_nibble"),
            (F.length(bare) == 32).alias("roundtrip_ok"),
        )
        .orderBy("doc_id")
    )


@query(
    "agg_bounding_ratio",
    """
WITH ordered AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rn_d
  FROM events
),
ends AS (
  SELECT user_id,
         max(CASE WHEN rn_a = 1 THEN value END) AS first_v,
         max(CASE WHEN rn_d = 1 THEN value END) AS last_v,
         max(CASE WHEN rn_a = 1 THEN epoch_us(ts) END) AS first_t,
         max(CASE WHEN rn_d = 1 THEN epoch_us(ts) END) AS last_t
  FROM ordered GROUP BY user_id
)
SELECT user_id,
       CAST(round((last_v - first_v) / ((last_t - first_t) / 1000000.0), 6)
            AS DOUBLE) + 0.0 AS bounding_ratio
FROM ends
WHERE last_t > first_t
ORDER BY user_id
""",
)
def agg_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``boundingRatio(x, y)`` analog: per user, the slope
    between the first and last (ts, value) points —
    (y_last - y_first) / (t_last - t_first). Spark-first: ``min_by`` /
    ``max_by`` with a (ts, event_id) struct key pick both endpoints in ONE
    partial-aggregating pass (no window, no sort of the full history);
    the oracle proves it against the explicit row_number formulation.

    A tiny negative slope rounds to IEEE ``-0.0`` in one engine and
    ``+0.0`` in the other (the round-3 driver red row: user 138 at sf0.01
    stringifies as ``-0.000000`` vs ``0.000000``); ``+ 0.0`` after the
    round() normalizes signed zero identically on both sides
    (IEEE 754: ``-0.0 + 0.0 = +0.0``)."""
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    ends = e.groupBy("user_id").agg(
        F.min_by("value", key).alias("first_v"),
        F.max_by("value", key).alias("last_v"),
        F.min(F.unix_micros("ts")).alias("first_t"),
        F.max(F.unix_micros("ts")).alias("last_t"),
    )
    return (
        ends.filter(F.col("last_t") > F.col("first_t"))
        .select(
            "user_id",
            (
                F.round(
                    (F.col("last_v") - F.col("first_v"))
                    / ((F.col("last_t") - F.col("first_t")) / F.lit(1000000.0)),
                    6,
                )
                + F.lit(0.0)
            ).alias("bounding_ratio"),
        )
        .orderBy("user_id")
    )


#: 3-gram set of the fixed probe phrase, computed once in Python so both
#: engines receive the identical literal list.
_NGRAM_PROBE = "the quick brown fox jumps"
_PROBE_GRAMS = sorted({_NGRAM_PROBE[i : i + 3] for i in range(len(_NGRAM_PROBE) - 2)})


def _ngram_distance_oracle() -> str:
    lits = ", ".join("'" + g.replace("'", "''") + "'" for g in _PROBE_GRAMS)
    return f"""
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, length(lower(text)) - 1),
                       i -> substr(lower(text), i, 3))) AS gs
  FROM documents
  WHERE length(text) >= 3 AND doc_id < 2000
)
SELECT doc_id,
       CAST(len(gs) AS BIGINT) AS n_grams,
       CAST(len(list_intersect(gs, [{lits}])) AS BIGINT) AS n_shared,
       CAST(round(1.0 - 2.0 * len(list_intersect(gs, [{lits}]))
                  / (len(gs) + {len(_PROBE_GRAMS)}), 6) AS DOUBLE) AS ngram_dist
FROM grams
ORDER BY doc_id
"""


@query("text_ngram_distance", _ngram_distance_oracle())
def text_ngram_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ngramDistance(text, needle)`` analog: Sorensen-Dice
    distance between the distinct character-3-gram sets of each document
    and a fixed probe phrase — 1 - 2|A intersect B| / (|A| + |B|). The
    probe's gram set is computed once driver-side and shipped as a
    literal array, so the whole operator is map-only codegen (transform /
    array_distinct / array_intersect), no UDF, no shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") >= 3) & (F.col("doc_id") < 2000)
    )
    # Two codegen pitfalls avoided here: (1) materialize lower(text) in
    # its own projection — inlined into the lambda it re-lowercases the
    # document at every gram position; (2) gram via element_at over a
    # pre-split char array, NOT substring(lt, i, 3) — Spark's UTF-8
    # substring seeks from the string start, making per-position substring
    # O(chars^2) per document (measured 6.4 s -> ~1 s at sf0.1 combined).
    lowd = d.select("doc_id", F.split(F.lower(F.col("text")), "").alias("cs"))
    gs = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(cs) - 2), i -> "
            "concat(element_at(cs, i), element_at(cs, i + 1), element_at(cs, i + 2)))"
        )
    )
    probe = F.array(*[F.lit(g) for g in _PROBE_GRAMS])
    g = lowd.select("doc_id", gs.alias("gs"))
    shared = F.size(F.array_intersect(F.col("gs"), probe))
    return (
        g.select(
            "doc_id",
            F.size("gs").cast("long").alias("n_grams"),
            shared.cast("long").alias("n_shared"),
            F.round(
                1.0 - 2.0 * shared / (F.size("gs") + F.lit(len(_PROBE_GRAMS))), 6
            ).alias("ngram_dist"),
        )
        .orderBy("doc_id")
    )


@query(
    "scalar_array_transforms",
    """
WITH a AS (
  SELECT p_partkey,
         [CAST(p_size AS BIGINT), CAST((p_size * 3) % 11 AS BIGINT),
          CAST((p_size * 7) % 13 AS BIGINT), CAST(2 AS BIGINT)] AS arr
  FROM part
)
SELECT p_partkey,
       array_to_string(list_transform(range(1, 5),
         i -> CASE WHEN i = 1 THEN 0 ELSE arr[i] - arr[i - 1] END), ',')
         AS arr_diff,
       array_to_string(list_transform(range(1, 5),
         i -> list_sum(list_slice(arr, 1, i))), ',') AS arr_cumsum,
       array_to_string(list_sort(arr), ',') AS arr_sorted,
       CAST(list_sum(arr) AS BIGINT) AS arr_total
FROM a
ORDER BY p_partkey
""",
)
def scalar_array_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array-transform family (``arrayDifference``,
    ``arrayCumSum``, ``arraySort``) over integer arrays built from part
    attributes. Integer element math keeps the serialized form exact in
    both engines (float arrays would hit repr differences); arrays are
    emitted as joined strings because the driver's canonicalizer cannot
    sort raw list cells."""
    p = load_table(spark, sf_dir, "part")
    arr = F.array(
        F.col("p_size").cast("long"),
        ((F.col("p_size") * 3) % 11).cast("long"),
        ((F.col("p_size") * 7) % 13).cast("long"),
        F.lit(2).cast("long"),
    )
    a = p.select("p_partkey", arr.alias("arr"))
    diff = F.expr(
        "transform(sequence(1, 4), i -> IF(i = 1, 0L, element_at(arr, i) - element_at(arr, i - 1)))"
    )
    cumsum = F.expr(
        "transform(sequence(1, 4), i -> aggregate(slice(arr, 1, i), 0L, (acc, x) -> acc + x))"
    )
    join_ = lambda c: F.concat_ws(",", F.transform(c, lambda x: x.cast("string")))
    return (
        a.select(
            "p_partkey",
            join_(diff).alias("arr_diff"),
            join_(cumsum).alias("arr_cumsum"),
            join_(F.array_sort(F.col("arr"))).alias("arr_sorted"),
            F.aggregate(F.col("arr"), F.lit(0).cast("long"), lambda acc, x: acc + x)
            .alias("arr_total"),
        )
        .orderBy("p_partkey")
    )


@query(
    "agg_linear_regression",
    """
WITH q AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 1000000 - 1704067200 AS DECIMAL(12,0)) AS x,
         CAST(round(value, 3) AS DECIMAL(7,3)) AS y
  FROM events
),
sums AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(24,3))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(28,0))) AS DOUBLE) AS sxx
  FROM q
  GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS DOUBLE)
         + 0.0 AS slope,
       CAST(round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
            AS DOUBLE) + 0.0 AS intercept
FROM sums
ORDER BY event_type
""",
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(x, y)`` analog: per event type,
    least-squares slope/intercept of value over time. Same portability
    discipline as the moment family (stats.py): the four cross sums
    accumulate in EXACT decimal over quantized inputs (naive double sums
    are summation-order-dependent and engines disagree in the last bits),
    then the closed-form solution is evaluated in double from those exact
    sums — bit-identical everywhere. One map-side-combinable aggregate,
    no window, no second pass."""
    e = load_table(spark, sf_dir, "events")
    x = (
        (F.unix_micros("ts") / F.lit(1000000)).cast("long") - F.lit(1704067200)
    ).cast("decimal(12,0)")
    y = F.round(F.col("value"), 3).cast("decimal(7,3)")
    q = e.select("event_type", x.alias("x"), y.alias("y"))
    sums = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(24,3)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,0)"))
        .cast("double")
        .alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        sums.select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            # slope/intercept can round to zero from below; + 0.0 collapses
            # IEEE -0.0 identically in both engines (agg_bounding_ratio r3 red)
            (F.round(slope, 9) + F.lit(0.0)).alias("slope"),
            (
                F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
                + F.lit(0.0)
            ).alias("intercept"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_topk_weighted",
    """
SELECT l_suppkey AS item,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS est_weight
FROM lineitem
GROUP BY l_suppkey
ORDER BY est_weight DESC, item
LIMIT 10
""",
)
def agg_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted(10)(l_suppkey, l_quantity)`` analog via
    the weighted SpaceSaving sketch (operators/sketches.py). Run at a
    capacity above the distinct supplier count the sketch is exact — the
    GROUP BY oracle checks that; squeezing capacity bounds the shuffle at
    O(batches * capacity) with the Misra-Gries survival guarantee carried
    over to weight mass. Quantities are integral in this schema, so the
    int64 weight accumulation is exact."""
    from go_nats_to_clickhouse_spark.operators.sketches import topk_weighted_sketch

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", F.col("l_quantity").cast("long").alias("w")
    )
    return (
        topk_weighted_sketch(l, "l_suppkey", "w", k=10, capacity=65536)
        .select(F.col("item"), F.col("est_weight"))
    )


@query(
    "scalar_bit_functions",
    """
SELECT event_id,
       event_id & 255 AS low_byte,
       event_id | 4096 AS with_flag,
       xor(event_id, 1365) AS xored,
       event_id << 3 AS shifted_l,
       event_id >> 2 AS shifted_r,
       CAST(bit_count(event_id) AS INT) AS popcount,
       CAST((event_id >> 4) & 1 AS INT) AS bit4
FROM events
WHERE event_id < 5000
ORDER BY event_id
""",
)
def scalar_bit_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse scalar bit family (``bitAnd``/``bitOr``/``bitXor``/
    ``bitShiftLeft``/``bitShiftRight``/``bitCount``/``bitTest``) — all
    integer codegen on both engines, so values match exactly (the
    aggregate counterparts live in ``agg_bit_ops``)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    eid = F.col("event_id")
    return (
        e.select(
            "event_id",
            eid.bitwiseAND(255).alias("low_byte"),
            eid.bitwiseOR(4096).alias("with_flag"),
            eid.bitwiseXOR(1365).alias("xored"),
            F.shiftleft(eid, 3).alias("shifted_l"),
            F.shiftright(eid, 2).alias("shifted_r"),
            F.bit_count(eid).cast("int").alias("popcount"),
            F.shiftright(eid, 4).bitwiseAND(1).cast("int").alias("bit4"),
        )
        .orderBy("event_id")
    )


@query(
    "agg_retention_flags",
    """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view'
                   AND ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS c1,
         max(CASE WHEN event_type = 'click'
                   AND ts >= TIMESTAMP '2024-01-08'
                   AND ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS c2,
         max(CASE WHEN event_type = 'purchase'
                   AND ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS c3
  FROM events
  GROUP BY user_id
)
SELECT CAST(sum(c1) AS BIGINT) AS r1,
       CAST(sum(c1 * c2) AS BIGINT) AS r2,
       CAST(sum(c1 * c3) AS BIGINT) AS r3
FROM per_user
""",
)
def agg_retention_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(cond1, cond2, cond3)`` analog: per user,
    flag whether they viewed in week 1, clicked in week 2, purchased
    after week 2; the result is the summed flag array [r1, r1&r2, r1&r3]
    (later flags only count when the entry condition held — exactly CH's
    retention semantics). Two partial-aggregating passes, no window, no
    event-list materialization."""
    e = load_table(spark, sf_dir, "events")
    w1 = F.lit("2024-01-08").cast("timestamp")
    w2 = F.lit("2024-01-15").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "view") & (F.col("ts") < w1), 1).otherwise(0)
        ).alias("c1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= w1)
                & (F.col("ts") < w2),
                1,
            ).otherwise(0)
        ).alias("c2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= w2), 1
            ).otherwise(0)
        ).alias("c3"),
    )
    return per_user.agg(
        F.sum("c1").cast("long").alias("r1"),
        F.sum(F.col("c1") * F.col("c2")).cast("long").alias("r2"),
        F.sum(F.col("c1") * F.col("c3")).cast("long").alias("r3"),
    )


@query(
    "scalar_null_semantics",
    """
WITH n AS (
  SELECT l_returnflag, nullif(l_linenumber, 3) AS ln
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(ln) AS BIGINT) AS n_nonnull,
       CAST(sum(ln) AS BIGINT) AS sum_skips_null,
       CAST(round(avg(ln), 6) AS DOUBLE) AS avg_skips_null,
       CAST(min(least(ln, 2)) AS INT) AS least_skips_null,
       CAST(max(greatest(ln, 2)) AS INT) AS greatest_skips_null,
       CAST(sum(CASE WHEN ln IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS nullsafe_null_matches,
       CAST(sum(CASE WHEN coalesce(ln, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS coalesced_zeros
FROM n
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics family (ClickHouse ``ifNull``/``nullIf``/
    ``assumeNotNull`` territory, plus the ANSI traps): COUNT(*) vs
    COUNT(col), null-skipping SUM/AVG/LEAST/GREATEST, null-safe equality
    (``<=>`` / IS NOT DISTINCT FROM), and coalesce defaults — the places
    engines classically diverge, pinned here to identical answers."""
    l = load_table(spark, sf_dir, "lineitem")
    ln = F.nullif(F.col("l_linenumber"), F.lit(3))
    n = l.select("l_returnflag", ln.alias("ln"))
    return (
        n.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("ln").alias("n_nonnull"),
            F.sum("ln").cast("long").alias("sum_skips_null"),
            F.round(F.avg("ln"), 6).alias("avg_skips_null"),
            F.min(F.least(F.col("ln"), F.lit(2))).cast("int").alias("least_skips_null"),
            F.max(F.greatest(F.col("ln"), F.lit(2)))
            .cast("int")
            .alias("greatest_skips_null"),
            F.sum(F.when(F.col("ln").eqNullSafe(F.lit(None)), 1).otherwise(0))
            .cast("long")
            .alias("nullsafe_null_matches"),
            F.sum(F.when(F.coalesce(F.col("ln"), F.lit(0)) == 0, 1).otherwise(0))
            .cast("long")
            .alias("coalesced_zeros"),
        )
        .orderBy("l_returnflag")
    )
