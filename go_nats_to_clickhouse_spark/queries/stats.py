"""Statistical aggregate analogs: varPop/stddevPop/skewPop/kurtPop,
groupBitAnd/Or/Xor, entropy.

ClickHouse ships these as first-class aggregates over its event tables
(init.sql:74-96 schema); each is re-expressed as one map-side-combinable
hash aggregate.

Portability discipline for the moment family: naive double summation is
order-dependent, and every engine's built-in variance/skewness uses its own
summation order — two engines on identical data disagree in the last bits.
Here the four raw power sums S1..S4 accumulate in **exact decimal** over
values quantized to 3 fractional digits (so S4 stays inside the 38-digit
decimal cap for this data's range), and the central-moment formulas are then
evaluated in IEEE double from those exact sums — bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table


@query(
    "agg_statistical_moments",
    """
WITH q AS (
  SELECT event_type, CAST(round(value, 3) AS DECIMAL(7,3)) AS v
  FROM events
),
pw AS (
  -- explicit intermediate casts: each power is exact at its scale; the
  -- casts only bound DuckDB's precision-widening so nothing overflows
  SELECT event_type, v,
         -- DECIMAL(19,6) forces int128 storage: DuckDB multiplies
         -- int64-stored (p<=18) decimals in int64 and overflows
         CAST(v * v AS DECIMAL(19,6)) AS v2
  FROM q
),
sums AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(v) AS DOUBLE) AS s1,
         CAST(SUM(v2) AS DOUBLE) AS s2,
         CAST(SUM(CAST(v2 * v AS DECIMAL(26,9))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(v2 * v2 AS DECIMAL(34,12))) AS DOUBLE) AS s4
  FROM pw
  GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       ROUND(s1 / n, 6) AS mean_v,
       ROUND(s2 / n - (s1 / n) * (s1 / n), 6) AS var_pop,
       ROUND(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS stddev_pop,
       ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) + 0.0 AS skew_pop,
       ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)))
             - 3, 6) + 0.0 AS kurt_pop
FROM sums
ORDER BY event_type
""",
)
def agg_statistical_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``varPop``/``stddevPop``/``skewPop``/``kurtPop`` analog
    per event_type, via exact-decimal raw power sums (see module docstring
    for why the built-in skewness/kurtosis can't be oracle-checked).

    Scale shape: a single hash aggregate — four decimal sums + count merge
    map-side, so 100 TB of values reduce to (event_type, 5 numbers) before
    the shuffle; the double-precision central-moment algebra runs once per
    group on the reducer.
    """
    events = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value"), 3).cast("decimal(7,3)")
    sums = events.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("s1"),
        F.sum(F.expr("v * v")).cast("double").alias("s2"),
        F.sum(F.expr("v * v * v")).cast("double").alias("s3"),
        F.sum(F.expr("(v * v) * (v * v)")).cast("double").alias("s4"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1") / n
    e2 = F.col("s2") / n
    e3 = F.col("s3") / n
    e4 = F.col("s4") / n
    var = e2 - m1 * m1
    m3c = e3 - F.lit(3) * m1 * e2 + F.lit(2) * m1 * m1 * m1
    m4c = e4 - F.lit(4) * m1 * e3 + F.lit(6) * m1 * m1 * e2 - F.lit(3) * m1 * m1 * m1 * m1
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(m1, 6).alias("mean_v"),
        F.round(var, 6).alias("var_pop"),
        F.round(F.sqrt(var), 6).alias("stddev_pop"),
        # skew/kurt are sign-free of the (positive) inputs, so a symmetric
        # group can round to zero from below; + 0.0 collapses IEEE -0.0
        # identically in both engines (DuckDB round() preserves the sign of
        # a tiny negative, Spark's does not — the agg_bounding_ratio r3 red)
        (F.round(m3c / F.pow(var, 1.5), 6) + F.lit(0.0)).alias("skew_pop"),
        (F.round(m4c / (var * var) - 3, 6) + F.lit(0.0)).alias("kurt_pop"),
    ).orderBy("event_type")


@query(
    "agg_bit_ops",
    """
SELECT event_type,
       CAST(bit_and(user_id) AS BIGINT) AS band,
       CAST(bit_or(user_id) AS BIGINT) AS bor,
       CAST(bit_xor(user_id) AS BIGINT) AS bxor,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupBitAnd``/``groupBitOr``/``groupBitXor`` analog over
    user ids — the permission-mask / bloom-ish aggregate family.

    Bitwise aggregates are associative+commutative integers, so map-side
    partials are exact and order-free: the ideal 100 TB aggregate (each
    partition reduces to 3 longs before the shuffle).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.bit_and("user_id").alias("band"),
            F.bit_or("user_id").alias("bor"),
            F.bit_xor("user_id").alias("bxor"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_entropy",
    """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
),
t AS (SELECT user_id, SUM(c) AS n FROM c GROUP BY user_id)
SELECT c.user_id,
       ROUND(-SUM((CAST(c.c AS DOUBLE) / t.n)
                  * log2(CAST(c.c AS DOUBLE) / t.n)), 6) + 0.0 AS entropy_bits,
       CAST(COUNT(*) AS BIGINT) AS n_types
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id
ORDER BY c.user_id
""",
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``entropy(event_type)`` analog: Shannon entropy (bits) of
    each user's event-type distribution.

    Two-level aggregate: the first groupBy reduces 100 TB of events to
    (user, type, count) — at most |users|x|types| rows — and the entropy
    sum runs over that tiny relation. The probabilities are exact rationals
    of integer counts, so log2 sees identical doubles in every engine.
    """
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    t = c.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            # a single-type user yields -SUM(+0.0) = IEEE -0.0; + 0.0
            # normalizes the zero's sign identically in both engines
            (F.round(-F.sum(p * F.log2(p)), 6) + F.lit(0.0)).alias("entropy_bits"),
            F.count(F.lit(1)).alias("n_types"),
        )
        .orderBy("user_id")
    )
