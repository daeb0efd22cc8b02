"""Round-4 ClickHouse analog families: interval aggregates
(``intervalLengthSum``, ``maxIntersections``/``maxIntersectionsPosition``),
two-sample statistics (``welchTTest``, ``rankCorr``, ``covarPop``/``corr``),
and the vector distance scalar family (``L1Distance``/``L2Distance``/
``LinfDistance``/``dotProduct``/``cosineDistance``).

The reference (go-nats-to-clickhouse) delegates its entire query surface to
ClickHouse (init.sql:8-121); these are the ClickHouse built-ins a user of
that stack reaches for next, re-expressed Spark-first.

Portability discipline (same as stats.py / agg_linear_regression): every
cross-engine float comes from EXACT integer/decimal sums evaluated in
double at the end, and every rounded value that can reach zero from below
carries ``+ 0.0`` (IEEE: -0.0 + 0.0 = +0.0) on BOTH engine and oracle
sides — the round-3 signed-zero lesson.

Intervals are synthesized deterministically from the events fixture:
``[ts, ts + value seconds)`` — value is positive (0.01..490.02), so every
interval is non-degenerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

#: interval end in exact micros: value has 2 fixture decimals, so
#: value * 1e6 is mathematically integral and round() lands both engines on
#: the same integer despite double representation error.
_DUR_US_SQL = "CAST(round(value * 1000000) AS BIGINT)"


def _dur_us() -> F.Column:
    return F.round(F.col("value") * F.lit(1000000.0), 0).cast("long")


@query(
    "agg_interval_length_sum",
    f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_DUR_US_SQL} AS e
  FROM events WHERE user_id < 50
),
m AS (
  SELECT user_id, event_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM iv
),
fl AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni
  FROM m
),
isl AS (
  SELECT user_id, s, e,
         sum(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM fl
),
merged AS (
  SELECT user_id, island, max(e) - min(s) AS covered
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(covered) AS BIGINT) AS covered_us,
       CAST(count(*) AS BIGINT) AS n_islands
FROM merged
GROUP BY user_id
ORDER BY user_id
""",
)
def agg_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum(start, end)`` analog: per user, the
    total time covered by the union of [ts, ts + value sec) intervals,
    plus the merged-interval count. Classic gaps-and-islands: an interval
    starts a new island iff its start exceeds the running max end of all
    preceding intervals; within an island the union is contiguous, so the
    covered length is max(end) - min(start). All integer microseconds —
    exact in both engines.

    Scale shape: one shuffle on user_id serves both windows and the final
    aggregate (same partitioning); state per row is one running max + one
    running sum — no self-join over the interval history."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _dur_us()).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    pme = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    fl = iv.select(
        "user_id",
        "s",
        "e",
        F.when(pme.isNull() | (F.col("s") > pme), 1).otherwise(0).alias("ni"),
        F.col("event_id"),
    )
    isl = fl.select(
        "user_id",
        "s",
        "e",
        F.sum("ni")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    merged = isl.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.sum("covered").cast("long").alias("covered_us"),
            F.count(F.lit(1)).alias("n_islands"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_max_intersections",
    f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_DUR_US_SQL} AS e
  FROM events WHERE user_id < 50
),
pts AS (
  SELECT user_id, s AS t, 1 AS d, event_id FROM iv
  UNION ALL
  SELECT user_id, e AS t, -1 AS d, event_id FROM iv
),
run AS (
  SELECT user_id, t,
         sum(d) OVER (PARTITION BY user_id ORDER BY t, d, event_id
                      ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
),
mx AS (
  SELECT user_id, t, conc,
         max(conc) OVER (PARTITION BY user_id) AS max_conc
  FROM run
)
SELECT user_id,
       CAST(max_conc AS INT) AS max_concurrent,
       CAST(min(t) AS BIGINT) AS position_us
FROM mx
WHERE conc = max_conc
GROUP BY user_id, max_conc
ORDER BY user_id
""",
)
def agg_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections``/``maxIntersectionsPosition`` analog:
    per user, the maximum number of simultaneously-open [ts, ts+value sec)
    intervals and the earliest instant it is reached. Sweep line: +1 at
    each start, -1 at each end, running sum ordered by (t, d) — d=-1
    sorts first so a half-open end never overlaps a start at the same
    instant. Two windows on the same user_id partitioning, then one
    aggregate; no pairwise interval join (the naive overlap join is
    O(n²) per user)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    # one scan (r12): the +1/-1 sweep points were a UNION of two
    # projections of the same subtree — two full event passes at scale;
    # an inline explode of the 2-struct array emits the same rows from
    # one pass (inline, not a named array column — the
    # InferFiltersFromGenerate trap documented on operators/dedup
    # .shingle_arrays)
    pts = e.select(
        "user_id",
        "event_id",
        F.explode(
            F.array(
                F.struct(
                    F.unix_micros("ts").alias("t"), F.lit(1).alias("d")
                ),
                F.struct(
                    (F.unix_micros("ts") + _dur_us()).alias("t"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("p"),
    ).select("user_id", F.col("p.t").alias("t"), F.col("p.d").alias("d"), "event_id")
    w = Window.partitionBy("user_id").orderBy("t", "d", "event_id")
    run = pts.select(
        "user_id",
        "t",
        F.sum("d")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("conc"),
    )
    mx = run.select(
        "user_id",
        "t",
        "conc",
        F.max("conc").over(Window.partitionBy("user_id")).alias("max_conc"),
    )
    return (
        mx.filter(F.col("conc") == F.col("max_conc"))
        .groupBy("user_id", "max_conc")
        .agg(F.min("t").cast("long").alias("position_us"))
        .select(
            "user_id",
            F.col("max_conc").cast("int").alias("max_concurrent"),
            "position_us",
        )
        .orderBy("user_id")
    )


#: exact power sums per group over 3-dp-quantized values — the shared
#: portability idiom (see stats.py module docstring)
_WELCH_SUMS_SQL = """
sums AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(v) AS DOUBLE) AS s1,
         CAST(SUM(CAST(v * v AS DECIMAL(19,6))) AS DOUBLE) AS s2
  FROM (SELECT event_type, CAST(round(value, 3) AS DECIMAL(7,3)) AS v
        FROM events WHERE event_type IN ('view', 'click'))
  GROUP BY event_type
)
"""


@query(
    "agg_welch_ttest",
    f"""
WITH {_WELCH_SUMS_SQL},
ab AS (
  SELECT
    max(CASE WHEN event_type = 'view' THEN n END) AS na,
    max(CASE WHEN event_type = 'view' THEN s1 END) AS sa1,
    max(CASE WHEN event_type = 'view' THEN s2 END) AS sa2,
    max(CASE WHEN event_type = 'click' THEN n END) AS nb,
    max(CASE WHEN event_type = 'click' THEN s1 END) AS sb1,
    max(CASE WHEN event_type = 'click' THEN s2 END) AS sb2
  FROM sums
),
st AS (
  SELECT na, nb,
         sa1 / na AS ma, sb1 / nb AS mb,
         (sa2 - sa1 * sa1 / na) / (na - 1) / na AS qa,
         (sb2 - sb1 * sb1 / nb) / (nb - 1) / nb AS qb
  FROM ab
)
SELECT CAST(na AS BIGINT) AS n_view,
       CAST(nb AS BIGINT) AS n_click,
       round((ma - mb) / sqrt(qa + qb), 6) + 0.0 AS t_stat,
       round((qa + qb) * (qa + qb)
             / (qa * qa / (na - 1) + qb * qb / (nb - 1)), 6) + 0.0 AS df
FROM st
""",
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``welchTTest(value, group)`` analog between the 'view'
    and 'click' event populations: Welch's unequal-variance t statistic
    and its Welch–Satterthwaite degrees of freedom, computed closed-form
    from exact decimal power sums (one map-side-combinable aggregate over
    100 TB; the algebra runs once on two rows). t can round to zero from
    below — ``+ 0.0`` normalizes the signed zero on both sides."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    v = F.round(F.col("value"), 3).cast("decimal(7,3)")
    sums = e.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(19,6)"))
        .cast("double")
        .alias("s2"),
    )
    ab = sums.agg(
        F.max(F.when(F.col("event_type") == "view", F.col("n"))).alias("na"),
        F.max(F.when(F.col("event_type") == "view", F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("event_type") == "view", F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("event_type") == "click", F.col("s1"))).alias("sb1"),
        F.max(F.when(F.col("event_type") == "click", F.col("s2"))).alias("sb2"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sa1") / na
    mb = F.col("sb1") / nb
    qa = (F.col("sa2") - F.col("sa1") * F.col("sa1") / na) / (na - 1) / na
    qb = (F.col("sb2") - F.col("sb1") * F.col("sb1") / nb) / (nb - 1) / nb
    t = (ma - mb) / F.sqrt(qa + qb)
    df = (qa + qb) * (qa + qb) / (
        qa * qa / (na - 1) + qb * qb / (nb - 1)
    )
    return ab.select(
        F.col("na").cast("long").alias("n_view"),
        F.col("nb").cast("long").alias("n_click"),
        (F.round(t, 6) + F.lit(0.0)).alias("t_stat"),
        (F.round(df, 6) + F.lit(0.0)).alias("df"),
    )


@query(
    "agg_rank_corr",
    """
WITH q AS (
  SELECT event_type,
         epoch_us(ts) AS x,
         CAST(round(value, 3) AS DECIMAL(7,3)) AS y
  FROM events
),
r AS (
  -- average (fractional) ranks doubled to stay integral: 2*avg_rank =
  -- 2*rank + (ties - 1)
  SELECT event_type,
         2 * rank() OVER (PARTITION BY event_type ORDER BY x)
           + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
         2 * rank() OVER (PARTITION BY event_type ORDER BY y)
           + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry
  FROM q
),
s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(rx AS BIGINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ry AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(rx AS BIGINT) * ry) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(rx AS BIGINT) * rx) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ry AS BIGINT) * ry) AS DOUBLE) AS syy
  FROM r GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
         AS spearman_rho
FROM s
ORDER BY event_type
""",
)
def agg_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``rankCorr(x, y)`` analog: Spearman rank correlation
    between event time and value per event type, with average ranks for
    ties (the standard definition). Ranks are doubled so tie-averages stay
    integral — the rank sums are then EXACT int64 and both engines hit
    identical doubles in the closed-form Pearson-on-ranks. Two windows +
    one aggregate, all on the event_type shuffle."""
    e = load_table(spark, sf_dir, "events")
    q = e.select(
        "event_type",
        F.unix_micros("ts").alias("x"),
        F.round(F.col("value"), 3).cast("decimal(7,3)").alias("y"),
    )
    wx = Window.partitionBy("event_type").orderBy("x")
    wy = Window.partitionBy("event_type").orderBy("y")
    rx = (
        F.lit(2) * F.rank().over(wx)
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "x"))
        - F.lit(1)
    ).cast("long")
    ry = (
        F.lit(2) * F.rank().over(wy)
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "y"))
        - F.lit(1)
    ).cast("long")
    r = q.select("event_type", rx.alias("rx"), ry.alias("ry"))
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    rho = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.round(rho, 6) + F.lit(0.0)).alias("spearman_rho"),
    ).orderBy("event_type")


@query(
    "agg_covar_corr",
    """
WITH q AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 1000000 - 1704067200 AS DECIMAL(12,0)) AS x,
         CAST(round(value, 3) AS DECIMAL(7,3)) AS y
  FROM events
),
s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(24,3))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(28,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM q GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round(sxy / n - (sx / n) * (sy / n), 6) + 0.0 AS covar_pop,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
         AS pearson_corr
FROM s
ORDER BY event_type
""",
)
def agg_covar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``covarPop(x, y)`` / ``corr(x, y)`` analog between
    rebased event seconds and value per event type. Same exact-decimal
    power-sum discipline as agg_linear_regression (naive double sums are
    summation-order-dependent across engines); covariance and correlation
    can round to zero from below, so both carry the ``+ 0.0`` signed-zero
    normalization."""
    e = load_table(spark, sf_dir, "events")
    x = (
        (F.unix_micros("ts") / F.lit(1000000)).cast("long") - F.lit(1704067200)
    ).cast("decimal(12,0)")
    y = F.round(F.col("value"), 3).cast("decimal(7,3)")
    q = e.select("event_type", x.alias("x"), y.alias("y"))
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(24,3)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(19,6)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n").cast("double")
    covar = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.round(covar, 6) + F.lit(0.0)).alias("covar_pop"),
        (F.round(corr, 6) + F.lit(0.0)).alias("pearson_corr"),
    ).orderBy("event_type")


@query(
    "text_repetition_ratio",
    """
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, len(string_split(text, ' ')) - 1),
                        i -> concat_ws(' ', string_split(text, ' ')[i],
                                       string_split(text, ' ')[i + 1],
                                       string_split(text, ' ')[i + 2])) AS gs
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
)
SELECT doc_id,
       CAST(len(gs) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
       round(1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs), 6)
         AS dup_gram_ratio
FROM g
ORDER BY doc_id
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (the Gopher/MassiveText "fraction of
    duplicate n-grams" quality rule): per document, total vs distinct word
    3-grams and the duplicate fraction. High ratios flag boilerplate /
    degenerate generations before training. Map-only codegen (split once,
    transform + array_distinct) — no shuffle, embarrassingly parallel at
    any corpus size. The ratio is 1 - distinct/total ∈ [0, 1) — it cannot
    round to zero from below, so no signed-zero exposure."""
    d = load_table(spark, sf_dir, "documents")
    parts = ", ".join(f"element_at(ws, i + {j})" for j in range(3))
    grams = F.expr(
        f"transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', {parts}))"
    )
    g = (
        d.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
        .filter(F.size("ws") >= 3)
        .select("doc_id", grams.alias("gs"))
    )
    return g.select(
        "doc_id",
        F.size("gs").cast("long").alias("n_grams"),
        F.size(F.array_distinct("gs")).cast("long").alias("n_distinct"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("gs")).cast("double") / F.size("gs"),
            6,
        ).alias("dup_gram_ratio"),
    ).orderBy("doc_id")


@query(
    "behavioral_next_event",
    """
WITH nxt AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT next_type, CAST(count(*) AS BIGINT) AS n
FROM nxt
WHERE event_type = 'view' AND next_type IS NOT NULL
GROUP BY next_type
ORDER BY next_type
""",
)
def behavioral_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode()`` analog: what does a user do
    immediately after a 'view'? One lead() window on the (user_id) shuffle
    plus a tiny aggregate over event-type pairs — the per-user event
    history never leaves its partition, and the output is bounded by the
    event-type vocabulary."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        nxt.filter((F.col("event_type") == "view") & F.col("next_type").isNotNull())
        .groupBy("next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("next_type")
    )


@query(
    "timeseries_resample_interpolate",
    """
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         (2 * SUM(CAST(round(value * 1000) AS BIGINT)) * 1000 + COUNT(*))
           // (2 * COUNT(*)) AS vm
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT event_type, min(h) AS h0, max(h) AS h1 FROM base GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
joined AS (
  SELECT g.event_type, g.h, b.vm,
         last_value(b.vm IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.h
                 ROWS UNBOUNDED PRECEDING) AS pm,
         last_value(CASE WHEN b.vm IS NOT NULL THEN g.h END IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.h
                 ROWS UNBOUNDED PRECEDING) AS ph,
         first_value(b.vm IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm,
         first_value(CASE WHEN b.vm IS NOT NULL THEN g.h END IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM grid g LEFT JOIN base b ON b.event_type = g.event_type AND b.h = g.h
)
SELECT event_type, h,
       vm IS NOT NULL AS observed,
       CAST(CASE
         WHEN vm IS NOT NULL THEN vm
         WHEN pm IS NULL THEN nm
         WHEN nm IS NULL THEN pm
         ELSE (2 * (pm * date_diff('hour', h, nh)
                    + nm * date_diff('hour', ph, h))
               + date_diff('hour', ph, nh))
              // (2 * date_diff('hour', ph, nh))
       END AS DOUBLE) / 1000000 AS v_interp
FROM joined
ORDER BY event_type, h
""",
)
def timeseries_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY ... WITH FILL ... INTERPOLATE`` analog: hourly
    resample of value per event type with LINEAR interpolation across
    missing hours (edges carry the nearest observation). Every rounding
    step happens in INTEGER micro-units (the q1 fuzz-finding treatment):
    the hourly mean is the half-up integer ``(2*milli_sum*1000 + n) div
    (2n)`` and the interpolation is the half-up integer
    ``(2*(pm*(b-a) + nm*a) + b) div (2b)`` over integer hour offsets —
    pure int64 arithmetic both engines evaluate identically, with only
    the final display division by 10^6 touching floating point.
    ``round(double, 6)`` as a last step was the round-8 fuzz sweep's
    knife edge (seeds 99/3: midpoints of 2-dp cents land exactly on 6-dp
    halves, and Spark's BigDecimal half-up vs DuckDB's scale-multiply
    std::round legitimately disagree there). int64 headroom: micro-means
    ≤ ~3.3e8 times hour spans ≤ ~1e4 stays < 1e13. Grid axis comes from
    a 2-row bounds aggregate exploded with sequence() — never a
    driver-side loop; the ignore-nulls window pair resolves both
    interpolation endpoints on ONE event_type shuffle. Values are
    positive (fixture value ≥ 0.01), so ``div`` (truncating) and
    DuckDB ``//`` (flooring) agree on every quotient here."""
    e = load_table(spark, sf_dir, "events")
    milli = F.round(F.col("value") * 1000).cast("long")
    base = (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.sum(milli).alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "h",
            F.expr("(2 * s * 1000 + n) div (2 * n)").alias("vm"),
        )
    )
    bounds = base.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    j = grid.join(base, ["event_type", "h"], "left")
    wback = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfwd = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("vm").isNotNull(), F.col("h"))
    joined = j.select(
        "event_type",
        "h",
        "vm",
        F.last("vm", ignorenulls=True).over(wback).alias("pm"),
        F.last(obs_h, ignorenulls=True).over(wback).alias("ph"),
        F.first("vm", ignorenulls=True).over(wfwd).alias("nm"),
        F.first(obs_h, ignorenulls=True).over(wfwd).alias("nh"),
    )
    # integer hour offsets: a = hours(ph -> h), b = hours(ph -> nh);
    # the ELSE branch only fires strictly between observations (b >= 2)
    interp_micros = (
        F.when(F.col("vm").isNotNull(), F.col("vm"))
        .when(F.col("pm").isNull(), F.col("nm"))
        .when(F.col("nm").isNull(), F.col("pm"))
        .otherwise(
            F.expr(
                "(2 * (pm * ((unix_micros(nh) - unix_micros(h))"
                "            div 3600000000)"
                "       + nm * ((unix_micros(h) - unix_micros(ph))"
                "               div 3600000000))"
                " + ((unix_micros(nh) - unix_micros(ph)) div 3600000000))"
                " div (2 * ((unix_micros(nh) - unix_micros(ph))"
                "           div 3600000000))"
            )
        )
    )
    return joined.select(
        "event_type",
        "h",
        F.col("vm").isNotNull().alias("observed"),
        (interp_micros.cast("double") / F.lit(1000000)).alias("v_interp"),
    ).orderBy("event_type", "h")


@query(
    "scalar_string_search_functions",
    """
SELECT doc_id,
       CAST(instr(text, 'the') AS BIGINT) AS pos_the,
       CAST(instr(lower(text), 'lorem') AS BIGINT) AS pos_lorem_ci,
       CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
         AS n_the,
       (instr(text, 'data') > 0 OR instr(text, 'fox') > 0
        OR instr(text, 'lorem') > 0) AS multi_any,
       text LIKE 'The%' AS starts_the,
       text LIKE '%.' AS ends_period
FROM documents
ORDER BY doc_id
""",
)
def scalar_string_search_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse string-search family analog: ``position`` (1-based, 0
    when absent), ``positionCaseInsensitive``, ``countSubstrings``
    (non-overlapping, via the length-difference identity — no regex
    engine), ``multiSearchAny``, ``startsWith``/``endsWith``. Map-only
    codegen over the documents table."""
    d = load_table(spark, sf_dir, "documents")
    n_the = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("the"))))
        / 3
    ).cast("long")
    return d.select(
        "doc_id",
        F.instr(F.col("text"), "the").cast("long").alias("pos_the"),
        F.instr(F.lower(F.col("text")), "lorem").cast("long").alias("pos_lorem_ci"),
        n_the.alias("n_the"),
        (
            (F.instr(F.col("text"), "data") > 0)
            | (F.instr(F.col("text"), "fox") > 0)
            | (F.instr(F.col("text"), "lorem") > 0)
        ).alias("multi_any"),
        F.col("text").startswith("The").alias("starts_the"),
        F.col("text").endswith(".").alias("ends_period"),
    ).orderBy("doc_id")


@query(
    "text_mix_report",
    """
WITH per AS (
  SELECT lang, source,
         COUNT(*) AS n_docs,
         SUM(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY lang, source
)
SELECT lang, source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(CAST(n_tokens AS DOUBLE)
             / sum(n_tokens) OVER (), 6) AS token_share
FROM per
ORDER BY lang, source
""",
)
def text_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix report: document and whitespace-token counts per
    (lang, source) cell with each cell's share of corpus tokens — the
    table a data-mixture rebalancing pass starts from. One hash aggregate
    over the corpus (token counts reduce map-side); the share is a window
    over the tiny |langs|x|sources| cell table. Shares are ratios of
    positive counts — no signed-zero exposure."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
    )
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(
        Window.partitionBy()
    )
    return per.select(
        "lang",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(share, 6).alias("token_share"),
    ).orderBy("lang", "source")


#: deterministic 64-dim probe vector shared verbatim by both engines
#: (same driver-side-literal idiom as text.py's _PROBE_GRAMS)
_PROBE_VEC = [((i * 37) % 13 - 6) / 7.0 for i in range(64)]


def _probe_sql() -> str:
    return "[" + ", ".join(repr(v) for v in _PROBE_VEC) + "]"


@query(
    "vector_distance_functions",
    f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_probe_sql()} AS p
  FROM embeddings WHERE vec_id < 500
)
SELECT vec_id,
       round(list_sum(list_transform(range(1, 65),
             i -> abs(v[i] - p[i]))), 6) AS l1_dist,
       round(sqrt(list_sum(list_transform(range(1, 65),
             i -> (v[i] - p[i]) * (v[i] - p[i])))), 6) AS l2_dist,
       round(list_max(list_transform(range(1, 65),
             i -> abs(v[i] - p[i]))), 6) AS linf_dist,
       round(list_sum(list_transform(range(1, 65),
             i -> v[i] * p[i])), 6) + 0.0 AS dot_p,
       round(1.0 - list_sum(list_transform(range(1, 65), i -> v[i] * p[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
                * sqrt(list_sum(list_transform(range(1, 65),
                       i -> p[i] * p[i])))), 6) + 0.0 AS cosine_dist
FROM e
ORDER BY vec_id
""",
)
def vector_distance_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse vector scalar family (``L1Distance`` / ``L2Distance`` /
    ``LinfDistance`` / ``dotProduct`` / ``cosineDistance``) against a fixed
    probe vector shipped as a literal to both engines. Pure codegen folds
    (zip_with + aggregate, sequential left-to-right like DuckDB list_sum)
    — map-only, no shuffle; dot and cosine distance can round to zero from
    below, hence ``+ 0.0``."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    p = F.array(*[F.lit(x) for x in _PROBE_VEC])

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    diff = F.zip_with(v, p, lambda a, b: a - b)
    l1 = fold(F.transform(diff, lambda d: F.abs(d)))
    l2 = F.sqrt(fold(F.transform(diff, lambda d: d * d)))
    linf = F.array_max(F.transform(diff, lambda d: F.abs(d)))
    dotp = fold(F.zip_with(v, p, lambda a, b: a * b))
    vv = fold(F.transform(v, lambda a: a * a))
    pp = fold(F.transform(p, lambda a: a * a))
    cosd = F.lit(1.0) - dotp / (F.sqrt(vv) * F.sqrt(pp))
    return e.select(
        "vec_id",
        F.round(l1, 6).alias("l1_dist"),
        F.round(l2, 6).alias("l2_dist"),
        F.round(linf, 6).alias("linf_dist"),
        (F.round(dotp, 6) + F.lit(0.0)).alias("dot_p"),
        (F.round(cosd, 6) + F.lit(0.0)).alias("cosine_dist"),
    ).orderBy("vec_id")
