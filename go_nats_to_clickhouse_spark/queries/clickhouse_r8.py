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
