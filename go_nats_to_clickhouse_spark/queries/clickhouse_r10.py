"""Round-10 ClickHouse analogs: the last uncovered statistical
aggregate functions from ClickHouse's surface — ``analysisOfVariance``
(one-way ANOVA F), ``meanZTest`` (known-variance two-sample z),
``seriesOutliersDetectTukey`` (IQR-fence outlier detection), and
``seriesDecomposeSTL`` (classical additive seasonal decomposition).

The reference (go-nats-to-clickhouse) delegates its entire query
surface to ClickHouse (init.sql creates the tables; every analytical
function ClickHouse ships is available to its users), so these rows
complete the statistical-aggregate family started in
queries/clickhouse_r4.py (welchTTest) and r5 (mannWhitneyUTest,
kolmogorovSmirnovTest, studentTTest).

Cross-engine exactness strategy (same as the r4/r5 stats rows): the
event ``value`` column carries exactly two fractional digits, so every
query works on the scaled integer ``v2 = round(100 * value)``. All
sums/counts are then exact int64/decimal; the final statistic is a
closed-form DOUBLE expression written with ONE fixed evaluation order
in both the Spark code and the DuckDB oracle — IEEE-754 ops in the same
order on identical inputs produce identical bits, and a final round(6)
absorbs nothing but the printing.

REGISTRY ACTIVATION IS DEFERRED TO ROUND 11 (``register()`` below, not
called from queries/__init__ yet): the staleness gate requires every
new registry row to occupy one of the driver's 50 sample slots
(tools/staleness.py), and the round-10 window is fully committed to the
r3/r4 rotation-debt cohort that VERDICT r9 #1 ordered repaid without
displacement ("never displace an old cohort for a new query"). The
rows are fully implemented and oracle-verified by
tests/test_clickhouse_r10.py against live DuckDB in the meantime; the
round-11 session flips them live by calling ``register()`` from
queries/__init__ and fronting the four names in ``_PRIORITY``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import load_table

#: the fixture's closed event-type domain, fixed order — pivoting the
#: per-group sums into columns (instead of SUM-ming over a 5-row group
#: relation) is what pins the double-precision combination order.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_V2_SQL = """
v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v2
  FROM events
)
"""


def _scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v2"),
    )


# ---------------------------------------------------------------------------
# analysisOfVariance (ANOVA F statistic)
# ---------------------------------------------------------------------------

_ANOVA_PIVOT_SQL = ",\n".join(
    f"""
         CAST(SUM(CASE WHEN event_type = '{g}' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_{g},
         CAST(SUM(CASE WHEN event_type = '{g}' THEN v2 ELSE 0 END) AS BIGINT)
           AS s_{g}"""
    for g in EVENT_TYPES
)

_SSB_PART_SQL = " + ".join(
    f"(CAST(s_{g} AS DOUBLE) * CAST(s_{g} AS DOUBLE)) / CAST(n_{g} AS DOUBLE)"
    for g in EVENT_TYPES
)

# group count interpolated everywhere it appears, so a domain change
# cannot leave the degrees of freedom silently stale in both engines
_K = len(EVENT_TYPES)


ORACLE_ANOVA = f"""
WITH {_V2_SQL},
piv AS (
  SELECT {_ANOVA_PIVOT_SQL},
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v2) AS BIGINT) AS s,
         CAST(SUM(CAST(v2 * v2 AS DECIMAL(38, 0))) AS DOUBLE) AS q
  FROM v
),
terms AS (
  SELECT n, ({_SSB_PART_SQL}) AS ssb_part,
         (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE) AS cf,
         q
  FROM piv
)
SELECT CAST({_K} AS INT) AS n_groups, n AS n_rows,
       CAST({_K - 1} AS BIGINT) AS df_between,
       CAST(n - {_K} AS BIGINT) AS df_within,
       round(((ssb_part - cf) / {float(_K - 1)!r})
             / ((q - ssb_part) / CAST(n - {_K} AS DOUBLE)), 6) AS f_stat
FROM terms
"""


def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``analysisOfVariance(value, group)`` analog: the
    one-way ANOVA F statistic of event ``value`` across the five event
    types. (ClickHouse also returns the p-value; the F-distribution CDF
    exists in neither engine's SQL surface, so the oracle-checked row is
    the statistic plus both degrees of freedom — enough to look p up.)

    Shape: one map-side-combinable aggregate over the fact stream —
    every per-group count/sum/sum-of-squares is a conditional SUM, so
    the 100-TB scan reduces to a single 13-number row with no shuffle
    beyond the final 1-partition combine. The five groups are pivoted
    into fixed COLUMNS (not a 5-row relation) so the double-precision
    sum of the s_g^2/n_g terms has one fixed left-to-right order in
    both engines — SUM over a group relation would make the float
    combination order engine-dependent.

    Exactness: counts and value sums are exact int64 on the 100x-scaled
    values; the sum of squares accumulates as DECIMAL(38,0) in BOTH
    engines (v2^2 ~ 1.6e9 per row, so an int64 accumulator would wrap
    past ~5.7e9 rows — exactly the 100-TB regime; decimal38 is exact to
    ~1e38, i.e. ~6e28 rows) and converts to DOUBLE once — a single
    correctly-rounded op on the identical exact integer in both
    engines. F is scale-invariant, so the 100x factor cancels.
    """
    base = _scaled(spark, sf_dir)
    aggs = []
    for g in EVENT_TYPES:
        is_g = F.when(F.col("event_type") == g, 1).otherwise(0)
        aggs.append(F.sum(is_g).cast("long").alias(f"n_{g}"))
        aggs.append(
            F.sum(F.when(F.col("event_type") == g, F.col("v2")).otherwise(0))
            .cast("long")
            .alias(f"s_{g}")
        )
    piv = base.agg(
        *aggs,
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v2").cast("long").alias("s"),
        F.sum((F.col("v2") * F.col("v2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("q"),
    )
    ssb_part = None
    for g in EVENT_TYPES:
        term = (
            F.col(f"s_{g}").cast("double") * F.col(f"s_{g}").cast("double")
        ) / F.col(f"n_{g}").cast("double")
        ssb_part = term if ssb_part is None else ssb_part + term
    nd = F.col("n").cast("double")
    cf = (F.col("s").cast("double") * F.col("s").cast("double")) / nd
    terms = piv.select(
        "n", ssb_part.alias("ssb_part"), cf.alias("cf"), "q"
    )
    return terms.select(
        F.lit(_K).cast("int").alias("n_groups"),
        F.col("n").alias("n_rows"),
        F.lit(_K - 1).cast("long").alias("df_between"),
        (F.col("n") - _K).cast("long").alias("df_within"),
        F.round(
            ((F.col("ssb_part") - F.col("cf")) / F.lit(float(_K - 1)))
            / (
                (F.col("q") - F.col("ssb_part"))
                / (F.col("n") - _K).cast("double")
            ),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# meanZTest (two-sample z with known population variances)
# ---------------------------------------------------------------------------

#: the test's KNOWN population variances — meanZTest's signature takes
#: them as parameters (the caller asserts them; the generator's value
#: design is uniform-ish over ~[0, 400], variance ~400^2/12).
POP_VAR_VIEW = 13000.0
POP_VAR_CLICK = 13500.0
#: two-sided 95% normal quantile, the default confidence ClickHouse uses
Z_975 = 1.959963984540054


ORACLE_MEAN_ZTEST = f"""
WITH {_V2_SQL},
piv AS (
  SELECT
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
      AS n1,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS n2,
    CAST(SUM(CASE WHEN event_type = 'view' THEN v2 ELSE 0 END) AS BIGINT)
      AS s1,
    CAST(SUM(CASE WHEN event_type = 'click' THEN v2 ELSE 0 END) AS BIGINT)
      AS s2
  FROM v
),
m AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS m1,
         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0 AS m2,
         sqrt({POP_VAR_VIEW!r} / CAST(n1 AS DOUBLE)
              + {POP_VAR_CLICK!r} / CAST(n2 AS DOUBLE)) AS se
  FROM piv
)
SELECT n1 AS n_view, n2 AS n_click,
       round(m1, 6) AS mean_view, round(m2, 6) AS mean_click,
       round((m1 - m2) / se, 6) + 0.0 AS z_stat,
       round((m1 - m2) - {Z_975!r} * se, 6) + 0.0 AS ci_low,
       round((m1 - m2) + {Z_975!r} * se, 6) + 0.0 AS ci_high
FROM m
"""


def agg_mean_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``meanZTest(pop_var_x, pop_var_y, conf)(value, cond)``
    analog between the 'view' and 'click' populations: the z statistic
    and the 95% confidence interval of the mean difference, with the
    population variances passed as known parameters (that is the
    function's contract — it is the known-variance counterpart of
    welchTTest, queries/clickhouse_r4.py). The p-value needs the normal
    CDF (erf), which neither engine exposes in SQL; z plus the CI is the
    oracle-checkable surface.

    Shape: conditional sums over one scan — map-side combinable, no
    shuffle beyond the final combine, same as agg_anova_f. Exactness:
    integer sums on 100x-scaled values; means, se, z and CI bounds are
    fixed-order double expressions identical in both engines.
    """
    base = _scaled(spark, sf_dir)
    is_view = F.col("event_type") == "view"
    is_click = F.col("event_type") == "click"
    piv = base.agg(
        F.sum(F.when(is_view, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(is_click, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(is_view, F.col("v2")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(is_click, F.col("v2")).otherwise(0))
        .cast("long")
        .alias("s2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    m = piv.select(
        "n1",
        "n2",
        (F.col("s1").cast("double") / n1d / F.lit(100.0)).alias("m1"),
        (F.col("s2").cast("double") / n2d / F.lit(100.0)).alias("m2"),
        F.sqrt(
            F.lit(POP_VAR_VIEW) / n1d + F.lit(POP_VAR_CLICK) / n2d
        ).alias("se"),
    )
    diff = F.col("m1") - F.col("m2")
    return m.select(
        F.col("n1").alias("n_view"),
        F.col("n2").alias("n_click"),
        F.round("m1", 6).alias("mean_view"),
        F.round("m2", 6).alias("mean_click"),
        (F.round(diff / F.col("se"), 6) + F.lit(0.0)).alias("z_stat"),
        (F.round(diff - F.lit(Z_975) * F.col("se"), 6) + F.lit(0.0)).alias(
            "ci_low"
        ),
        (F.round(diff + F.lit(Z_975) * F.col("se"), 6) + F.lit(0.0)).alias(
            "ci_high"
        ),
    )


# ---------------------------------------------------------------------------
# seriesOutliersDetectTukey (IQR fences, defaults 0.25 / 0.75 / k=1.5)
# ---------------------------------------------------------------------------


ORACLE_TUKEY = f"""
WITH {_V2_SQL},
r AS (
  SELECT event_type, v2,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v2) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
ix AS (
  SELECT event_type, v2, rn, n,
         (n - 1) // 4 AS i1, (n - 1) % 4 AS r1,
         (3 * (n - 1)) // 4 AS i3, (3 * (n - 1)) % 4 AS r3
  FROM r
),
qq AS (
  SELECT event_type, v2, n,
         SUM(CASE WHEN rn = i1 + 1 THEN (4 - r1) * v2
                  WHEN rn = i1 + 2 THEN r1 * v2 ELSE 0 END)
           OVER (PARTITION BY event_type) AS q1_4,
         SUM(CASE WHEN rn = i3 + 1 THEN (4 - r3) * v2
                  WHEN rn = i3 + 2 THEN r3 * v2 ELSE 0 END)
           OVER (PARTITION BY event_type) AS q3_4
  FROM ix
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(q1_4) AS DOUBLE) / 400.0 AS q1,
       CAST(MAX(q3_4) AS DOUBLE) / 400.0 AS q3,
       CAST(MAX(2 * q1_4 - 3 * (q3_4 - q1_4)) AS DOUBLE) / 800.0
         AS fence_lo,
       CAST(MAX(2 * q3_4 + 3 * (q3_4 - q1_4)) AS DOUBLE) / 800.0
         AS fence_hi,
       CAST(SUM(CASE WHEN 8 * v2 < 2 * q1_4 - 3 * (q3_4 - q1_4)
                       OR 8 * v2 > 2 * q3_4 + 3 * (q3_4 - q1_4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM qq
GROUP BY event_type
ORDER BY event_type
"""


def timeseries_outliers_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``seriesOutliersDetectTukey(series)`` analog at its
    defaults (quantiles 0.25/0.75, k = 1.5), per event-type series:
    Tukey's fences Q1 - 1.5*IQR / Q3 + 1.5*IQR and the count of points
    outside them. (ClickHouse returns a per-element score array; the
    tabular analog returns the per-series fences plus the outlier
    count — the same decision surface, aggregated.)

    Exactness — the interesting part: linear-interpolated quantiles are
    normally a cross-engine float hazard (the h = (n-1)p split point is
    irrational in binary). Here the interpolation runs ENTIRELY in
    scaled integers: with p = 1/4, h = (n-1)/4 splits as i = (n-1) div 4
    and quarter-remainder r = (n-1) mod 4, so 4*Q1 =
    (4-r)*v[i] + r*v[i+1] is an exact int64 (v already 100x-scaled
    ints). Fences multiply by 1.5, so 8*fence = 2*(4*Q1) - 3*(4*IQR) is
    exact too — the outlier comparison ``8*v2 < lo8`` is pure integer
    arithmetic, bit-identical across engines; the /400, /800 output
    scalings are exact binary ops on integers.

    Shape: one per-series sort window (row_number + count) feeding two
    analytic conditional sums — the standard distributed exact-quantile
    path. Each series partitions independently, so at 100 TB the sort
    is per-series-bounded (the fixture's 5 series are a stand-in for
    the per-metric series a deployment would fence); for billion-row
    single series the approx-percentile row (agg_percentiles) is the
    scale path, as in ClickHouse where quantileExact vs quantile makes
    the same trade.
    """
    base = _scaled(spark, sf_dir)
    part = Window.partitionBy("event_type")
    r = base.select(
        "event_type",
        "v2",
        F.row_number().over(part.orderBy("v2")).alias("rn"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    nm1 = F.col("n") - 1
    ix = r.select(
        "event_type",
        "v2",
        "rn",
        "n",
        F.expr("(n - 1) div 4").alias("i1"),
        (nm1 % 4).alias("r1"),
        F.expr("(3 * (n - 1)) div 4").alias("i3"),
        ((3 * nm1) % 4).alias("r3"),
    )

    def _q4(i: str, rr: str) -> F.Column:
        return F.sum(
            F.when(
                F.col("rn") == F.col(i) + 1, (4 - F.col(rr)) * F.col("v2")
            )
            .when(F.col("rn") == F.col(i) + 2, F.col(rr) * F.col("v2"))
            .otherwise(0)
        ).over(part)

    qq = ix.select(
        "event_type",
        "v2",
        "n",
        _q4("i1", "r1").alias("q1_4"),
        _q4("i3", "r3").alias("q3_4"),
    )
    lo8 = 2 * F.col("q1_4") - 3 * (F.col("q3_4") - F.col("q1_4"))
    hi8 = 2 * F.col("q3_4") + 3 * (F.col("q3_4") - F.col("q1_4"))
    return (
        qq.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            (F.max("q1_4").cast("double") / F.lit(400.0)).alias("q1"),
            (F.max("q3_4").cast("double") / F.lit(400.0)).alias("q3"),
            (F.max(lo8).cast("double") / F.lit(800.0)).alias("fence_lo"),
            (F.max(hi8).cast("double") / F.lit(800.0)).alias("fence_hi"),
            F.sum(
                F.when((8 * F.col("v2") < lo8) | (8 * F.col("v2") > hi8), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# seriesDecomposeSTL analog: classical additive seasonal decomposition
# ---------------------------------------------------------------------------

#: micros per hour — the bucket width of the decomposed series
_HOUR_US = 3_600_000_000

ORACLE_DECOMPOSE = f"""
WITH b AS (
  SELECT CAST(epoch_us(ts) // {_HOUR_US} AS BIGINT) AS h_idx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
grid AS (
  SELECT g.h_idx, COALESCE(b.c, 0) AS x
  FROM (
    SELECT unnest(generate_series((SELECT MIN(h_idx) FROM b),
                                  (SELECT MAX(h_idx) FROM b))) AS h_idx
  ) g
  LEFT JOIN b ON g.h_idx = b.h_idx
),
w AS (
  SELECT h_idx, x,
         SUM(x) OVER win25 AS s25,
         COUNT(*) OVER win25 AS c25,
         LAG(x, 12) OVER (ORDER BY h_idx) AS xm12,
         LEAD(x, 12) OVER (ORDER BY h_idx) AS xp12
  FROM grid
  WINDOW win25 AS (ORDER BY h_idx ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
t AS (
  SELECT h_idx, x,
         CASE WHEN c25 = 25 THEN 2 * s25 - xm12 - xp12 END AS trend2,
         CASE WHEN c25 = 25 THEN 48 * x - (2 * s25 - xm12 - xp12) END AS d48,
         h_idx % 24 AS hod
  FROM w
),
s AS (
  SELECT h_idx, x, trend2, d48,
         SUM(d48) OVER (PARTITION BY hod) AS s48,
         COUNT(d48) OVER (PARTITION BY hod) AS cs
  FROM t
)
SELECT h_idx, x AS n_events,
       CAST(trend2 AS DOUBLE) / 48.0 AS trend,
       CAST(s48 AS DOUBLE) / (48.0 * CAST(cs AS DOUBLE)) AS seasonal,
       (CAST(x AS DOUBLE) - CAST(trend2 AS DOUBLE) / 48.0)
         - CAST(s48 AS DOUBLE) / (48.0 * CAST(cs AS DOUBLE)) AS resid
FROM s
WHERE d48 IS NOT NULL
ORDER BY h_idx
"""


def timeseries_decompose_seasonal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse ``seriesDecomposeSTL(series, 24)`` analog: additive
    trend / seasonal / residual decomposition of the hourly event-count
    series at period 24. (STL proper iterates LOESS smoothers — a
    float-iteration surface no SQL engine reproduces bit-stably; the
    classical decomposition is the textbook analog with the same output
    contract: x = trend + seasonal + resid, which is what makes the row
    oracle-checkable.)

    Exactness: the series is DENSIFIED onto the full hour grid (missing
    hours are true zeros, and without densification the centered-MA ROWS
    frame would silently span gaps). Counts are ints, so the centered
    2x24 moving average is kept as the exact integer ``trend2 = 48 *
    trend = x[t-12] + 2*sum(x[t-11..t+11]) + x[t+12]`` (computed as
    ``2*s25 - lag12 - lead12`` off one 25-row frame), the detrended
    value as ``d48 = 48*x - trend2``, and the per-hour-of-day seasonal
    sums ``s48`` as exact integer window sums — every double in the
    output is produced by per-row fixed-order ops on exact integers,
    bit-identical across engines, no cross-row float summation anywhere.

    Scale shape: the grouped count is a map-side-combinable aggregate
    over the fact stream; everything after runs on the densified grid,
    whose size is the RETENTION WINDOW in hours (a deployment constant —
    ~9k rows/year), not the data volume, so the single-ordered-window
    stage is bounded regardless of fact size. The hour-of-day seasonal
    window partitions 24 ways.
    """
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h_idx")
        )
        .groupBy("h_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grid = (
        b.agg(F.min("h_idx").alias("lo"), F.max("h_idx").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("h_idx"))
        .join(b, "h_idx", "left")
        .select("h_idx", F.coalesce("c", F.lit(0)).alias("x"))
    )
    # the ordered windows run on the retention-bounded grid (see above)
    ordered = Window.orderBy("h_idx")
    win25 = ordered.rowsBetween(-12, 12)
    w = grid.select(
        "h_idx",
        "x",
        F.sum("x").over(win25).alias("s25"),
        F.count(F.lit(1)).over(win25).alias("c25"),
        F.lag("x", 12).over(ordered).alias("xm12"),
        F.lead("x", 12).over(ordered).alias("xp12"),
    )
    trend2 = 2 * F.col("s25") - F.col("xm12") - F.col("xp12")
    t = w.select(
        "h_idx",
        "x",
        F.when(F.col("c25") == 25, trend2).alias("trend2"),
        F.when(F.col("c25") == 25, 48 * F.col("x") - trend2).alias("d48"),
        (F.col("h_idx") % 24).alias("hod"),
    )
    hodw = Window.partitionBy("hod")
    s = t.select(
        "h_idx",
        "x",
        "trend2",
        "d48",
        F.sum("d48").over(hodw).alias("s48"),
        F.count("d48").over(hodw).alias("cs"),
    )
    trend = F.col("trend2").cast("double") / F.lit(48.0)
    seasonal = F.col("s48").cast("double") / (
        F.lit(48.0) * F.col("cs").cast("double")
    )
    return (
        s.filter(F.col("d48").isNotNull())
        .select(
            "h_idx",
            F.col("x").alias("n_events"),
            trend.alias("trend"),
            seasonal.alias("seasonal"),
            ((F.col("x").cast("double") - trend) - seasonal).alias("resid"),
        )
        .orderBy("h_idx")
    )


#: name -> (engine fn, oracle SQL) — what ``register()`` activates.
R10_ROWS = {
    "agg_anova_f": (agg_anova_f, ORACLE_ANOVA),
    "agg_mean_ztest": (agg_mean_ztest, ORACLE_MEAN_ZTEST),
    "timeseries_outliers_tukey": (timeseries_outliers_tukey, ORACLE_TUKEY),
    "timeseries_decompose_seasonal": (
        timeseries_decompose_seasonal,
        ORACLE_DECOMPOSE,
    ),
}


def register() -> None:
    """Activate the round-10 rows in the global query registry.

    NOT called at import in round 10 — see the module docstring: the
    driver's 50-slot sample window is fully committed to the r3/r4
    rotation-debt cohort this round, and the staleness gate correctly
    refuses new un-sampled rows outside that window. Round 11 calls
    this from queries/__init__ and fronts the four names in
    ``__spark_entry__._PRIORITY``."""
    for name, (fn, oracle) in R10_ROWS.items():
        query(name, oracle)(fn)
