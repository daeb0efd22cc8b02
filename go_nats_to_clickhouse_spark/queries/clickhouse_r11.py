"""Round-11 ClickHouse analogs: the last two statistical aggregates
without a registry row — ``skewPop``/``skewSamp``/``kurtPop``/
``kurtSamp`` (third/fourth standardized moments) and
``exponentialMovingAverage`` (time-decayed weighted mean).

The reference (go-nats-to-clickhouse) delegates its entire query
surface to ClickHouse (clickhouse-config/init/init.sql creates the
tables; every aggregate ClickHouse ships is reachable from them), so
these rows extend the statistical-aggregate family completed across
r4 (welchTTest), r5 (mannWhitney/KS/studentTTest) and r10 (ANOVA,
meanZTest, Tukey, STL).

Cross-engine exactness (same contract as r10): work on the 100x-scaled
integer ``v2 = round(100 * value)`` so every accumulated quantity is an
EXACT integer (int64 per element, DECIMAL(38,0) across the sum); the
final statistic is a closed-form DOUBLE expression with ONE fixed
evaluation order written identically in the Spark plan and the DuckDB
oracle. No float ever enters an order-dependent SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

_V2_SQL = """
v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v2,
         CAST(floor(epoch(ts)) AS BIGINT) AS t_sec
  FROM events
)
"""
# t_sec: floor(epoch(ts)), NOT a bare CAST — DuckDB's epoch() returns
# DOUBLE and CAST rounds to nearest, while Spark's unix_timestamp
# truncates sub-second timestamps; floor makes both engines truncate
# identically (the repo-wide convention, cf. relational.py's q1 oracle).


def _scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v2"),
        F.unix_timestamp("ts").cast("long").alias("t_sec"),
    )


# ---------------------------------------------------------------------------
# skewPop / skewSamp / kurtPop / kurtSamp
# ---------------------------------------------------------------------------

ORACLE_SKEW_KURT = f"""
WITH {_V2_SQL},
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v2) AS BIGINT) AS s1,
         CAST(SUM(CAST(v2 * v2 AS DECIMAL(38, 0))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(v2 * v2 * v2 AS DECIMAL(38, 0))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(v2 * v2 AS DECIMAL(19, 0))
                  * CAST(v2 * v2 AS DECIMAL(19, 0))) AS DOUBLE) AS s4
  FROM v
  GROUP BY event_type
),
m AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         s2, s3, s4
  FROM s
),
c AS (
  SELECT event_type, n, nd, mu,
         s2 / nd - mu * mu AS m2,
         s3 / nd - 3.0 * mu * (s2 / nd) + 2.0 * (mu * mu * mu) AS m3,
         s4 / nd - 4.0 * mu * (s3 / nd) + 6.0 * (mu * mu) * (s2 / nd)
           - 3.0 * (mu * mu * mu * mu) AS m4,
         (s2 - nd * (mu * mu)) / (nd - 1.0) AS s2s
  FROM m
)
SELECT event_type, n,
       round(m3 / sqrt(m2 * m2 * m2), 6) + 0.0 AS skew_pop,
       round(m3 / sqrt(s2s * s2s * s2s), 6) + 0.0 AS skew_samp,
       round(m4 / (m2 * m2), 6) + 0.0 AS kurt_pop,
       round(m4 / (s2s * s2s), 6) + 0.0 AS kurt_samp
FROM c
ORDER BY event_type
"""


@query("agg_skew_kurt", ORACLE_SKEW_KURT)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``skewPop/skewSamp/kurtPop/kurtSamp(value)`` analog,
    per event-type series: the third and fourth standardized moments in
    both population and sample flavors, mirroring ClickHouse's exact
    definitions — skewPop = m3 / m2^1.5, kurtPop = m4 / m2^2 (raw, NOT
    excess: ~3 for a normal), and the *Samp forms divide by the
    UNBIASED variance s2s = (S2 - n*mu^2)/(n-1) while keeping the
    population central moments m3/m4 in the numerator (that asymmetric
    mix is ClickHouse's documented behavior, not an error here).

    Shape: one scan -> per-group power sums (map-side combinable; the
    only shuffle is the 5-group final combine) -> closed-form moments.
    At 100 TB this is the ideal aggregate: four extra integer columns
    per partial, no second pass, no row explosion.

    Exactness: v2^2 and v2^3 stay in int64 per element, but v2^4 does
    NOT (v2 reaches ~5.6e4 at sf0.1, v2^4 ~ 9.9e18 > 2^63 — ANSI mode
    raised exactly this overflow during development), so the fourth
    power is the product of two DECIMAL(19,0) squares — exact decimal
    multiply in both engines. All sums accumulate as DECIMAL(38,0)
    (exact past 1e19 rows) and convert to DOUBLE once. The
    moment combination is a fixed-order double expression written
    token-identically in the oracle, and sqrt(x*x*x) replaces pow(x,
    1.5) because pow is not correctly rounded in either engine while
    multiply and sqrt are.
    """
    base = _scaled(spark, sf_dir)
    v = F.col("v2")
    s = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s1"),
        F.sum((v * v).cast("decimal(38,0)")).cast("double").alias("s2"),
        F.sum((v * v * v).cast("decimal(38,0)")).cast("double").alias("s3"),
        F.sum(
            (v * v).cast("decimal(19,0)") * (v * v).cast("decimal(19,0)")
        )
        .cast("double")
        .alias("s4"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    m = s.select(
        "event_type",
        "n",
        nd.alias("nd"),
        mu.alias("mu"),
        "s2",
        "s3",
        "s4",
    )
    nd, mu = F.col("nd"), F.col("mu")
    s2, s3, s4 = F.col("s2"), F.col("s3"), F.col("s4")
    c = m.select(
        "event_type",
        "n",
        "nd",
        "mu",
        (s2 / nd - mu * mu).alias("m2"),
        (s3 / nd - F.lit(3.0) * mu * (s2 / nd) + F.lit(2.0) * (mu * mu * mu)).alias(
            "m3"
        ),
        (
            s4 / nd
            - F.lit(4.0) * mu * (s3 / nd)
            + F.lit(6.0) * (mu * mu) * (s2 / nd)
            - F.lit(3.0) * (mu * mu * mu * mu)
        ).alias("m4"),
        ((s2 - nd * (mu * mu)) / (nd - F.lit(1.0))).alias("s2s"),
    )
    m2, m3, m4, s2s = F.col("m2"), F.col("m3"), F.col("m4"), F.col("s2s")
    return c.select(
        "event_type",
        "n",
        (F.round(m3 / F.sqrt(m2 * m2 * m2), 6) + F.lit(0.0)).alias("skew_pop"),
        (F.round(m3 / F.sqrt(s2s * s2s * s2s), 6) + F.lit(0.0)).alias(
            "skew_samp"
        ),
        (F.round(m4 / (m2 * m2), 6) + F.lit(0.0)).alias("kurt_pop"),
        (F.round(m4 / (s2s * s2s), 6) + F.lit(0.0)).alias("kurt_samp"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# exponentialMovingAverage
# ---------------------------------------------------------------------------

#: the analog's half-life in seconds (6 h — a quarter of the daily cycle
#: the events fixture carries)
EMA_HALFLIFE_S = 21_600
#: weights below 2^-40 (~9e-13) are exactly zero in the quantized
#: weight domain; 40 also bounds the shift so 1<<(40-k) stays in int64
EMA_MAX_HL = 40

ORACLE_EMA = f"""
WITH {_V2_SQL},
w AS (
  SELECT event_type, v2,
         CAST(floor((MAX(t_sec) OVER (PARTITION BY event_type) - t_sec)
                    / {EMA_HALFLIFE_S}.0) AS BIGINT) AS k
  FROM v
),
q AS (
  SELECT event_type, v2,
         CASE WHEN k < {EMA_MAX_HL}
              THEN (CAST(1 AS BIGINT) << ({EMA_MAX_HL} - k))
              ELSE CAST(0 AS BIGINT) END AS wq
  FROM w
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(v2 * wq AS DECIMAL(38, 0))) AS DOUBLE) AS num,
         CAST(SUM(CAST(wq AS DECIMAL(38, 0))) AS DOUBLE) AS den
  FROM q
  GROUP BY event_type
)
SELECT event_type, n,
       round((num / den) / 100.0, 6) + 0.0 AS ema_value
FROM s
ORDER BY event_type
"""


@query("agg_exp_moving_avg", ORACLE_EMA)
def agg_exp_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage(halflife)(value, time)``
    analog per event-type series: the exponentially time-decayed
    weighted mean of ``value`` anchored at each series' newest event,
    half-life 6 h.

    Analog decision (documented divergence): ClickHouse decays
    continuously (weight 2^(-dt/halflife) for real dt); the
    oracle-checked analog decays in WHOLE half-life steps — weight
    2^(-floor(dt/halflife)) — because a real-exponent pow() is not
    correctly rounded in either engine and its last-bit disagreement
    would poison the hash compare. The staircase keeps the identical
    decision surface (same anchor, same half-life, same decay ratio)
    while making every weight an exact power of two: an int64 bit
    shift 1<<(40-k), with weights under 2^-40 exactly zero (they are
    ~9e-13 of the newest event's weight — beneath any reporting
    precision).

    Shape: one shuffle on event_type for the per-series MAX(time)
    window, and the groupBy that follows reuses that partitioning
    (Catalyst elides the second exchange). At 100 TB the window's
    per-partition MAX is the only state — no sort spill risk (max
    needs no ordering) — and the weighted sums are map-side
    combinable integers.

    Exactness: the numerator v2*wq is int64 per element (49k * 2^40 ~
    5.4e16 < 2^63), both sums accumulate as DECIMAL(38,0) (exact past
    1e19 rows), and the single num/den double division plus the /100
    descale happen in one fixed order in both engines.
    """
    base = _scaled(spark, sf_dir)
    # floor, not cast: DuckDB CAST(double AS BIGINT) rounds-to-nearest
    # while Spark's cast truncates — floor() is identical in both (dt is
    # non-negative, and dt/halflife stays far from exact-integer
    # boundaries because dt is an integer second count).
    k = F.floor(
        (
            F.max("t_sec").over(Window.partitionBy("event_type"))
            - F.col("t_sec")
        )
        / F.lit(float(EMA_HALFLIFE_S))
    ).cast("long")
    w = base.select("event_type", "v2", k.alias("k"))
    wq = (
        F.when(
            F.col("k") < EMA_MAX_HL,
            F.expr(f"shiftleft(cast(1 as bigint), {EMA_MAX_HL} - k)"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("wq")
    )
    q = w.select("event_type", "v2", wq)
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("v2") * F.col("wq")).cast("decimal(38,0)"))
        .cast("double")
        .alias("num"),
        F.sum(F.col("wq").cast("decimal(38,0)")).cast("double").alias("den"),
    )
    return s.select(
        "event_type",
        "n",
        (F.round((F.col("num") / F.col("den")) / F.lit(100.0), 6) + F.lit(0.0)).alias(
            "ema_value"
        ),
    ).orderBy("event_type")
