"""Behavioral analytics over the events stream — the ClickHouse-flavored
query surface the reference's users actually run against its tables
(`windowFunnel` / `retention` analogs; ClickHouse docs call these
parametric aggregate functions; the reference exposes them implicitly by
sinking into ClickHouse, init.sql:1-107).

Both are expressed as portable relational plans — existential joins and
conditional distinct counts — rather than engine-specific aggregates, so
one DuckDB oracle checks them and Catalyst owns the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table


@query(
    "funnel_conversion",
    """
WITH v AS (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'),
u AS (SELECT DISTINCT user_id FROM events),
lvl1 AS (SELECT DISTINCT user_id FROM v),
lvl2 AS (
  SELECT DISTINCT v.user_id
  FROM v JOIN c ON c.user_id = v.user_id
   AND c.cts > v.vts AND c.cts <= v.vts + INTERVAL 1 HOUR
),
lvl3 AS (
  SELECT DISTINCT v.user_id
  FROM v
  JOIN c ON c.user_id = v.user_id AND c.cts > v.vts
   AND c.cts <= v.vts + INTERVAL 1 HOUR
  JOIN p ON p.user_id = v.user_id AND p.pts > c.cts
   AND p.pts <= v.vts + INTERVAL 1 HOUR
)
SELECT u.user_id,
       CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
                 WHEN l2.user_id IS NOT NULL THEN 2
                 WHEN l1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS funnel_level
FROM u
LEFT JOIN lvl1 l1 ON l1.user_id = u.user_id
LEFT JOIN lvl2 l2 ON l2.user_id = u.user_id
LEFT JOIN lvl3 l3 ON l3.user_id = u.user_id
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(1 hour)(ts, view, click, purchase)``
    analog: per user, the deepest strictly-ordered view -> click ->
    purchase chain completed within one hour of the chain's first step.

    Shape (r12 optimization): ONE events scan, ONE user_id window pass
    (merge-scan), ONE per-user aggregate — O(events) per user, all
    whole-stage codegen. The original spelling decorrelated each funnel
    level into its own existential join (seven events scans, three
    distinct-shuffles, three join-shuffles, and Σ|views|·|clicks| join
    fanout per user); an intermediate per-user sorted-array spelling
    removed the scans but kept the quadratic per-user work in
    interpreted higher-order lambdas (measured slower than the joins at
    10x). The merge-scan removes both: carry ``pv`` = the latest
    strictly-earlier view per row, and ``runpv`` = the running max of
    pv over clicks so far; then

      level 2  <=>  some click c has pv(c) >= c - 1h
        (take v = pv(c): v < c and c <= v+1h; conversely any witnessing
         v only lowers pv's bound),
      level 3  <=>  some purchase p has runpv(p) >= p - 1h
        (forward: v = pv(c) for the maximizing click c < p gives
         v < c < p <= v+1h, so c∈(v,v+1h] and p∈(c,v+1h]; backward: a
         chain's v bounds pv(c) from below and c precedes p).

    Strictness at equal timestamps is encoded in the sort priority
    (purchase < click < view), so a same-instant view is invisible to a
    click and a same-instant click invisible to a purchase — matching
    the oracle's strict inequalities. Null-ts rows carry null micros
    and drop out of every comparison, exactly like the join form.
    """
    e = load_table(spark, sf_dir, "events")
    us = 3_600_000_000  # one hour in microseconds (UTC session, no DST)
    typ = F.col("event_type")
    base = e.select(
        "user_id",
        "event_id",
        typ.alias("et"),
        F.unix_micros(F.col("ts")).alias("t"),
        F.when(typ == "purchase", 0)
        .when(typ == "click", 1)
        .when(typ == "view", 2)
        .otherwise(3)
        .alias("prio"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "prio", "event_id")
    run = base.select(
        "user_id",
        "et",
        "t",
        "prio",
        "event_id",
        F.last(F.when(F.col("et") == "view", F.col("t")), ignorenulls=True)
        .over(w)
        .alias("pv"),
    ).select(
        "user_id",
        "et",
        "t",
        F.col("pv"),
        F.max(F.when(F.col("et") == "click", F.col("pv"))).over(w).alias("runpv"),
    )
    return run.groupBy("user_id").agg(
        F.when(
            F.count(
                F.when(
                    (F.col("et") == "purchase")
                    & (F.col("runpv") >= F.col("t") - F.lit(us)),
                    1,
                )
            )
            > 0,
            3,
        )
        .when(
            F.count(
                F.when(
                    (F.col("et") == "click")
                    & (F.col("pv") >= F.col("t") - F.lit(us)),
                    1,
                )
            )
            > 0,
            2,
        )
        .when(F.count(F.when(F.col("et") == "view", 1)) > 0, 1)
        .otherwise(0)
        .cast("int")
        .alias("funnel_level"),
    )


@query(
    "retention_cohorts",
    """
WITH d AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
firsts AS (SELECT user_id, MIN(day) AS d0 FROM d GROUP BY user_id)
SELECT f.d0 AS cohort_day,
       COUNT(DISTINCT f.user_id) AS n_users,
       COUNT(DISTINCT CASE WHEN d.day = f.d0 + 1 THEN f.user_id END) AS retained_d1,
       COUNT(DISTINCT CASE WHEN d.day > f.d0 AND d.day <= f.d0 + 7
             THEN f.user_id END) AS retained_7d
FROM firsts f JOIN d ON d.user_id = f.user_id
GROUP BY f.d0
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention()`` analog as cohort analysis: users grouped
    by first-active day, with next-day and within-7-days return counts.

    Shape (r12 optimization): one events scan; the first-active day is a
    MIN window over the same user_id key the (user, day) distinct needs,
    replacing the previous groupBy + join-back (which re-scanned events
    and re-ran the distinct on both join inputs). The not-null filter
    mirrors the oracle's inner join on user_id, which drops a null user
    under SQL join semantics."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    d = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    dd = d.withColumn("d0", F.min("day").over(Window.partitionBy("user_id")))
    return dd.groupBy(F.col("d0").alias("cohort_day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(
            F.when(F.col("day") == F.date_add(F.col("d0"), 1), F.col("user_id"))
        ).alias("retained_d1"),
        F.countDistinct(
            F.when(
                (F.col("day") > F.col("d0"))
                & (F.col("day") <= F.date_add(F.col("d0"), 7)),
                F.col("user_id"),
            )
        ).alias("retained_7d"),
    )


@query(
    "range_join_incident_events",
    """
WITH incidents AS (
  SELECT event_id AS incident_id, ts AS start_ts,
         ts + INTERVAL 15 MINUTE AS end_ts
  FROM events WHERE event_type = 'error'
)
SELECT i.incident_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clicks
FROM incidents i
JOIN events e ON e.ts >= i.start_ts AND e.ts < i.end_ts
GROUP BY i.incident_id
""",
)
def range_join_incident_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: every error event opens a 15-minute
    incident window; count the events (and clicks) that fall inside each
    window. There is NO equi key — the naive `ts BETWEEN start AND end`
    join is a BroadcastNestedLoopJoin / cartesian in Spark, O(n·m) at
    100 TB. `operators/range_join.range_join` discretizes time into
    900-second buckets and equi-joins on the bucket id, so the plan is a
    shuffle equi-join partitioned by time bucket with the exact range
    predicate as a post-filter; each interval explodes into at most
    span/W + 1 = 2 bucket rows."""
    from go_nats_to_clickhouse_spark.operators.range_join import range_join

    e = load_table(spark, sf_dir, "events")
    incidents = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end_ts"),
    )
    points = e.select(F.col("ts").alias("ev_ts"), F.col("event_type").alias("ev_type"))
    joined = range_join(
        points,
        incidents,
        point="ev_ts",
        start="start_ts",
        end="end_ts",
        bucket_width=900,
        closed="left",
        # Occupancy guard: if the time axis turns out far more compressed
        # than 15-minute buckets assume (skew, fixture drift), shrink the
        # width so the equi-join keeps >=128 buckets instead of going
        # quadratic inside ~1 giant bucket.
        min_buckets=128,
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("ev_type") == "click", 1).otherwise(0)).alias("n_clicks"),
    )


@query(
    "timeseries_gap_fill",
    """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' AND value > 15
  GROUP BY 1
),
b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM hourly),
hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b)
SELECT h.hr, COALESCE(hourly.n_purchases, 0) AS n_purchases
FROM hours h LEFT JOIN hourly ON hourly.hr = h.hr
""",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY hr WITH FILL STEP INTERVAL 1 HOUR`` analog:
    hourly counts of a sparse event stream with empty hours densified to
    zero rows. The fill axis is generated distributively —
    ``sequence(min, max, 1 hour)`` exploded from the 1-row bounds
    aggregate — then left-joined back; the generated side is bounded by
    the time span (not the data volume), so at 100 TB it stays a
    broadcast-sized dimension regardless of corpus size."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 15)
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n_purchases")
    )
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    return hours.join(hourly, "hr", "left").select(
        "hr", F.coalesce("n_purchases", F.lit(0)).alias("n_purchases")
    )
