"""Query-surface completeness (SURVEY.md §2.7): scans, filters, joins of
every flavor, aggregations (incl. rollup/cube), window functions, sorts,
set ops, and scalar-function families — the ad-hoc SQL surface the
reference delegates to ClickHouse, expressed Spark-first.

Scale notes on each query: dimension sides of joins are broadcast
explicitly; aggregations are partial+final by construction (Catalyst);
top-k uses window-rank which AQE handles per-group. All money aggregates
use the exact-decimal strategy from ``queries.util``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import MONEY, RATE, dec, dsum, load_table

# ---------------------------------------------------------------------------
# Aggregation: TPC-H Q1 style pricing summary (hash agg, partial+final)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
  CAST((2 * SUM(CAST(round(l_quantity * 100) AS BIGINT)) * 10000 + COUNT(*))
       // (2 * COUNT(*)) AS DOUBLE) / 1000000 AS avg_qty,
  CAST((2 * SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) * 10000 + COUNT(*))
       // (2 * COUNT(*)) AS DOUBLE) / 1000000 AS avg_price,
  CAST((2 * SUM(CAST(round(l_discount * 100) AS BIGINT)) * 10000 + COUNT(*))
       // (2 * COUNT(*)) AS DOUBLE) / 1000000 AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary. Money sums use the exact-decimal
    strategy (decimal SUM, rounded in decimal, THEN cast to double —
    bit-identical across engines). The three averages are hardened one
    step further after a fuzz-sweep finding (tools/fuzzcheck.py, round
    8): ``round(sum_double / count, 6)`` can land EXACTLY on a 6-dp
    rounding boundary, where Spark (exact BigDecimal conversion of the
    double) and DuckDB (scale-multiply in floating point, then
    std::round) legitimately round opposite ways. The averages are
    therefore computed as half-up integers in MICRO units —
    ``(2 * cents * 10^4 + n) div (2n)`` — pure int64 arithmetic both
    engines evaluate identically for any data, and only the final
    display division by 10^6 touches floating point (same integer in,
    same double out). int64 headroom: the scaled sum is cents x 2e4,
    overflowing only past ~4.6e14 in group cents (~SF 100k)."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE))
    charge = disc_price * (F.lit(1) + dec("l_tax", RATE))

    def cents(col: str) -> Column:
        return F.round(F.col(col) * 100).cast("long")

    g = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            F.sum(cents("l_quantity")).alias("_qty_c"),
            F.sum(cents("l_extendedprice")).alias("_price_c"),
            F.sum(cents("l_discount")).alias("_disc_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

    def int_avg(sum_col: str) -> Column:
        # half-up integer micros: (2 * cents * 10^4 + n) div (2n)
        micros = F.expr(
            f"(2 * {sum_col} * 10000 + count_order) div (2 * count_order)"
        )
        return micros.cast("double") / F.lit(1000000)

    return g.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        int_avg("_qty_c").alias("avg_qty"),
        int_avg("_price_c").alias("avg_price"),
        int_avg("_disc_c").alias("avg_disc"),
        "count_order",
    )


# ---------------------------------------------------------------------------
# Joins: broadcast dim join + shuffle join + top-k (TPC-H Q3 style)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    """
SELECT
  l_orderkey,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE))
    return (
        l.join(o.join(c, o.o_custkey == c.c_custkey),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join: fact-fact shuffle join (orders x lineitem) with every
    dimension broadcast; the c_nationkey = s_nationkey 'local supplier'
    constraint rides on the join output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


@query(
    "q6_revenue_forecast",
    """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + tight predicate + global agg: the pushdown showcase — all four
    predicates reach the Parquet reader (PushedFilters)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(dec("l_extendedprice") * dec("l_discount", RATE), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    """
SELECT
  c_custkey,
  c_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
  n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------


@query(
    "agg_rollup_lineitem",
    """
SELECT
  l_returnflag, l_linestatus,
  COUNT(*) AS n,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum(dec("l_quantity"), "sum_qty")
    )


@query(
    "agg_cube_orders",
    """
SELECT
  o_orderstatus, o_orderpriority,
  COUNT(*) AS n,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum(dec("o_totalprice"), "total")
    )


@query(
    "agg_distinct_orders",
    """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_conditional",
    """
SELECT
  l_returnflag,
  CAST(ROUND(SUM(CASE WHEN l_quantity > 25 THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS bulk_revenue,
  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    bulk = F.when(F.col("l_quantity") > 25, dec("l_extendedprice")).otherwise(
        F.lit(0).cast(MONEY)
    )
    return l.groupBy("l_returnflag").agg(
        dsum(bulk, "bulk_revenue"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_topk_orders",
    """
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
""",
)
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via rank — the scalable alternative to per-group
    collect+sort (no driver involvement, partial shuffle only on the
    grouping key)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_spend",
    """
SELECT o_custkey, o_orderkey,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
FROM orders
""",
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "window_lag_events",
    """
SELECT event_id, user_id,
  LAG(event_type) OVER w AS prev_type,
  CAST(floor(epoch(ts)) AS BIGINT)
    - CAST(floor(epoch(LAG(ts) OVER w)) AS BIGINT) AS gap_seconds
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_seconds"),
    )


# ---------------------------------------------------------------------------
# Semi / anti joins, set ops, sorts
# ---------------------------------------------------------------------------


@query(
    "join_anti_customers_without_orders",
    """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
""",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no recent orders (predicate keeps the
    result non-empty at every SF — all-customers-have-orders data)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_semi_active_suppliers",
    """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey
    AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
)
""",
)
def join_semi_active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "set_intersect_big_spenders",
    """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
""",
)
def set_intersect_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(big)


@query(
    "set_except_never_urgent",
    """
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
)
def set_except_never_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # subtract == SQL EXCEPT (distinct): any customer appearing on the right
    # is removed entirely (exceptAll would only cancel per-occurrence).
    return o.select("o_custkey").subtract(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    )


@query(
    "sort_limit_expensive_parts",
    """
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 25
""",
)
def sort_limit_expensive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    + driver merge of k rows, never a full sort at scale."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@query(
    "scalar_string_functions",
    """
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  lower(p_brand) AS brand_lower,
  CAST(length(p_name) AS INT) AS name_len,
  substr(p_name, 1, 5) AS name_prefix,
  replace(p_type, 'A', '@') AS type_replaced,
  CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
  (p_name LIKE '%gold%') AS has_gold,
  trim(concat('  ', p_brand, '  ')) AS brand_trimmed,
  reverse(p_brand) AS brand_reversed,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
""",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit("A"), F.lit("@")).alias("type_replaced"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
        F.col("p_name").like("%gold%").alias("has_gold"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trimmed"
        ),
        F.reverse(F.col("p_brand")).alias("brand_reversed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "scalar_date_functions",
    """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INT) AS order_year,
  CAST(month(o_orderdate) AS INT) AS order_month,
  CAST(day(o_orderdate) AS INT) AS order_day,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  o_orderdate + INTERVAL 30 DAY AS due_date,
  CAST(quarter(o_orderdate) AS INT) AS order_quarter
FROM orders
""",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
    )


@query(
    "scalar_math_functions",
    """
SELECT
  p_partkey,
  CAST(ROUND(sqrt(CAST(p_size AS DOUBLE)), 6) AS DOUBLE) AS size_sqrt,
  abs(p_size - 25) AS size_dev,
  CAST(p_size % 7 AS INT) AS size_mod,
  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
  CAST(ROUND(p_retailprice, 1) AS DOUBLE) AS price_round1,
  greatest(p_size, 25) AS size_hi,
  least(p_size, 25) AS size_lo
FROM part
""",
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("size_sqrt"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.round(F.col("p_retailprice"), 1).alias("price_round1"),
        F.greatest("p_size", F.lit(25)).alias("size_hi"),
        F.least("p_size", F.lit(25)).alias("size_lo"),
    )


# ---------------------------------------------------------------------------
# Time-bucketed aggregation (batch twin of the streaming tumbling window)
# ---------------------------------------------------------------------------


@query(
    "tumbling_window_daily_events",
    """
SELECT
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  event_type,
  COUNT(*) AS n,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_window_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window over event time — F.window(), the same operator the
    streaming pipeline uses with a watermark (tested in tests/)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("value"), "total_value"),
        )
        .select(
            F.col("w.start").alias("day"), "event_type", "n", "total_value"
        )
    )


# ---------------------------------------------------------------------------
# As-of join (composition of window ops) and session windows
# ---------------------------------------------------------------------------


@query(
    "join_asof_last_click",
    """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, c.click_id AS prev_click_id,
       CAST(floor(epoch(p.ts)) AS BIGINT)
         - CAST(floor(epoch(c.click_ts)) AS BIGINT) AS gap_seconds
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.click_ts < p.ts
""",
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, Spark-first: instead of a per-row subquery, merge both
    event kinds into one time-ordered stream and carry the last click
    forward with a window (single shuffle on user_id, no join at all —
    this is the scalable as-of pattern when both sides share a key).

    Strictness: at equal timestamps the purchase sorts before the click
    (order by ts, is_click), so a same-instant click is NOT visible —
    matching the oracle's ``c.click_ts < p.ts``.
    """
    e = load_table(spark, sf_dir, "events")
    # one scan (r12): the union of two disjoint event_type filters over
    # the same table is a single IN-filtered scan with a derived tag —
    # the union spelling paid two full event passes at scale
    merged = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("is_click") == 1, F.col("event_id"))
    click_ts = F.when(F.col("is_click") == 1, F.col("ts"))
    out = merged.select(
        "event_id",
        "user_id",
        "ts",
        "is_click",
        F.last(click_id, ignorenulls=True).over(w).alias("prev_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("prev_click_ts"),
    )
    return out.filter(F.col("is_click") == 0).select(
        "event_id",
        "user_id",
        "prev_click_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp("prev_click_ts")
        ).alias("gap_seconds"),
    )


@query(
    "session_window_events",
    """
WITH marks AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS grp
  FROM marks
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM g
GROUP BY user_id, grp
""",
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) — F.session_window, the same
    operator the streaming layer uses with a watermark; the oracle is the
    classic gaps-and-islands formulation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Scalar families: arrays, regexp, conditionals
# ---------------------------------------------------------------------------


@query(
    "scalar_array_functions",
    """
SELECT
  p_partkey,
  CAST(len([p_size, p_size * 2, p_size * 3]) AS INT) AS arr_len,
  list_contains([p_size, p_size * 2], 10) AS has_ten,
  [p_size, p_size * 2, p_size * 3][2] AS second_elem,
  array_to_string(list_sort([p_size * 3, p_size, p_size * 2]), ',') AS sorted_str,
  CAST(list_sum(list_transform([p_size, p_size * 2], x -> CAST(x AS BIGINT))) AS BIGINT) AS arr_sum,
  array_to_string(list_reverse(string_split(p_name, ' ')), ' ') AS name_reversed_words,
  array_to_string(list_slice([p_size, p_size * 2, p_size * 3], 1, 2), ',') AS first_two
FROM part
""",
)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    arr3 = F.array(F.col("p_size"), F.col("p_size") * 2, F.col("p_size") * 3)
    arr2 = F.array(F.col("p_size"), F.col("p_size") * 2)
    return p.select(
        "p_partkey",
        F.size(arr3).cast("int").alias("arr_len"),
        F.array_contains(arr2, F.lit(10)).alias("has_ten"),
        F.get(arr3, 1).alias("second_elem"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.array(F.col("p_size") * 3, F.col("p_size"), F.col("p_size") * 2)
                ),
                lambda x: x.cast("string"),
            ),
        ).alias("sorted_str"),
        F.aggregate(
            F.transform(arr2, lambda x: x.cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("arr_sum"),
        F.concat_ws(" ", F.reverse(F.split(F.col("p_name"), " "))).alias(
            "name_reversed_words"
        ),
        F.concat_ws(
            ",", F.transform(F.slice(arr3, 1, 2), lambda x: x.cast("string"))
        ).alias("first_two"),
    )


@query(
    "scalar_regexp_functions",
    """
SELECT
  p_partkey,
  regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
  regexp_matches(p_name, '^[a-z]+ (widget|bolt)$') AS is_simple_part,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
  CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_word_tokens
FROM part
""",
)
def scalar_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
        F.col("p_name").rlike(r"^[a-z]+ (widget|bolt)$").alias("is_simple_part"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.size(F.expr("regexp_extract_all(p_name, '[a-z]+', 0)"))
        .cast("int")
        .alias("n_word_tokens"),
    )


@query(
    "scalar_conditional_functions",
    """
SELECT
  s_suppkey,
  coalesce(nullif(s_name, ''), 'unknown') AS name_or_unknown,
  CASE WHEN s_acctbal < 0 THEN 'debt'
       WHEN s_acctbal < 5000 THEN 'low'
       ELSE 'high' END AS bal_band,
  (s_acctbal > 0) AND (s_nationkey < 10) AS positive_near,
  greatest(s_acctbal, 0.0) AS bal_clamped,
  CASE WHEN s_nationkey % 2 = 0 THEN s_acctbal ELSE -s_acctbal END AS signed_bal
FROM supplier
""",
)
def scalar_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_or_unknown"
        ),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        ((F.col("s_acctbal") > 0) & (F.col("s_nationkey") < 10)).alias("positive_near"),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_clamped"),
        F.when(F.col("s_nationkey") % 2 == 0, F.col("s_acctbal"))
        .otherwise(-F.col("s_acctbal"))
        .alias("signed_bal"),
    )


@query(
    "scalar_map_functions",
    """
SELECT
  p_partkey,
  map(['brand', 'type'], [p_brand, p_type])['brand'][1] AS brand_val,
  map(['brand', 'type'], [p_brand, p_type])['color'][1] AS missing_val,
  CAST(cardinality(map(['brand', 'type'], [p_brand, p_type])) AS INT) AS map_size,
  array_to_string(list_sort(map_keys(map(['size', 'dbl'], [p_size, p_size * 2]))), ',') AS keys_sorted,
  array_to_string(map_values(map(['size', 'dbl'], [p_size, p_size * 2])), ',') AS vals_str,
  p_size * 10 AS scaled_val,
  map(['a'], [p_size])['a'][1] + map(['b'], [p_size * 2])['b'][1] AS merged_sum
FROM part
""",
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map scalar family (create/extract/keys/values/size/transform_values/
    map_concat). Result columns are scalars extracted FROM maps — a raw
    map column would hit engine-specific hash encodings in the driver's
    value-hash compare, extracted scalars are portable."""
    p = load_table(spark, sf_dir, "part")
    str_map = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    num_map = F.create_map(
        F.lit("size"), F.col("p_size"), F.lit("dbl"), F.col("p_size") * 2
    )
    merged = F.map_concat(
        F.create_map(F.lit("a"), F.col("p_size")),
        F.create_map(F.lit("b"), F.col("p_size") * 2),
    )
    return p.select(
        "p_partkey",
        F.element_at(str_map, "brand").alias("brand_val"),
        F.element_at(str_map, "color").alias("missing_val"),
        F.size(str_map).cast("int").alias("map_size"),
        F.concat_ws(",", F.array_sort(F.map_keys(num_map))).alias("keys_sorted"),
        F.concat_ws(
            ",", F.transform(F.map_values(num_map), lambda v: v.cast("string"))
        ).alias("vals_str"),
        F.element_at(
            F.transform_values(num_map, lambda k, v: v * 5), "dbl"
        ).alias("scaled_val"),
        (F.element_at(merged, "a") + F.element_at(merged, "b")).alias("merged_sum"),
    )


@query(
    "agg_topk_heavy_hitters",
    """
SELECT l_partkey AS item, COUNT(*) AS est_count
FROM lineitem
GROUP BY l_partkey
ORDER BY est_count DESC, item
LIMIT 10
""",
)
def agg_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topK(10)(l_partkey)`` analog via the SpaceSaving-style
    sketch (operators/sketches.py). Run at a capacity above the distinct
    count the sketch is exact, which is what the GROUP BY oracle checks;
    squeezing capacity bounds the shuffle at O(batches * capacity) with
    the Misra-Gries survival guarantee (tests/test_topk_sketch.py)."""
    from go_nats_to_clickhouse_spark.operators.sketches import topk_sketch

    l = load_table(spark, sf_dir, "lineitem")
    return topk_sketch(l, "l_partkey", k=10, capacity=65536)


@query(
    "agg_approx_distinct",
    """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS approx_in_bounds
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — ClickHouse's uniq() analog —
    with a *bounded-relative-error contract* instead of a rows-only check:
    HLL sketch values are engine-specific, but |approx - exact| <= 3*rsd
    (3-sigma at rsd=0.02 -> 6%, plus a +2 absolute floor for tiny groups)
    is a property any correct HLL satisfies, so the driver can hash-check
    it. The exact count rides along as the comparable column."""
    o = load_table(spark, sf_dir, "orders")
    approx = F.approx_count_distinct("o_custkey", rsd=0.02)
    exact = F.countDistinct("o_custkey")
    return o.groupBy("o_orderpriority").agg(
        exact.alias("exact_customers"),
        (
            F.abs(approx - exact)
            <= F.greatest(F.lit(2.0), exact * F.lit(0.06))
        ).alias("approx_in_bounds"),
    )


@query(
    "agg_percentiles",
    """
SELECT
  o_orderpriority,
  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99_price
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, verified identical). At 100 TB switch callers to
    percentile_approx — same API shape, bounded memory."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99_price"),
    )


@query(
    "agg_approx_percentile_bounds",
    """
SELECT
  o_orderpriority,
  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_median,
  TRUE AS approx_in_bounds
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (ClickHouse ``quantileTDigest`` analog) with a
    *bounded-rank-error contract*: sketch medians are engine-specific, but
    at accuracy=100 the estimate must land within the p45..p55 exact rank
    band — a property any correct quantile sketch satisfies, emitted as a
    hashable boolean next to the exact median (same pattern as
    agg_approx_distinct). Bounded memory at 100 TB where exact percentile
    would buffer each group."""
    o = load_table(spark, sf_dir, "orders")
    approx = F.expr("percentile_approx(o_totalprice, 0.5, 100)")
    lo = F.expr("percentile(o_totalprice, 0.45)")
    hi = F.expr("percentile(o_totalprice, 0.55)")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("exact_median"),
        ((approx >= lo) & (approx <= hi)).alias("approx_in_bounds"),
    )


@query(
    "join_asof_tolerance",
    """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       CASE WHEN c.click_ts >= p.ts - INTERVAL 1 HOUR THEN
         CAST(floor(epoch(p.ts)) AS BIGINT)
           - CAST(floor(epoch(c.click_ts)) AS BIGINT)
       END AS gap_seconds
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.click_ts <= p.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generalized as-of operator (operators/asof.py) with a
    tolerance: purchase -> latest click at-or-before it, nulled when more
    than an hour stale. Output is the gap, not the click id — equal-
    timestamp clicks tie on the gap, so the result stays deterministic
    across engines whatever the tie-pick."""
    from go_nats_to_clickhouse_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        direction="backward",
        strict=False,
        tolerance_seconds=3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("right_ts")).alias("gap_seconds"),
    )


@query(
    "window_range_frame_events",
    """
SELECT event_id, user_id,
  COUNT(*) OVER w AS n_last_hour,
  MAX(value) OVER w AS max_value_last_hour
FROM (
  SELECT event_id, user_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
)
def window_range_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: trailing one-hour event count and max per
    user. RANGE (value-based) frames include timestamp peers regardless
    of row order — deterministic where a ROWS frame over tied timestamps
    is not. Aggregates are COUNT/MAX (order-independent; a float SUM over
    a sliding frame would be engine-divergent)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.max("value").over(w).alias("max_value_last_hour"),
    )


@query(
    "pivot_status_by_priority",
    """
SELECT
  o_orderpriority,
  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_O,
  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_F,
  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_P
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (the scalable form: no
    values-discovery pre-pass, single shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot yields NULL for empty cells; COUNT(CASE ...) yields 0 — align.
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("st_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("st_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("st_P"),
    )


@query(
    "agg_grouping_sets",
    """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_rf,
       GROUPING(l_linestatus) AS g_ls,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers — the SQL surface
    (temp view + spark.sql), complementing the DataFrame rollup/cube."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
               CAST(grouping(l_linestatus) AS TINYINT) AS g_ls,
               COUNT(*) AS n
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "market_share_by_year",
    """
SELECT
  CAST(year(o_orderdate) AS INT) AS yr,
  CAST(ROUND(SUM(CASE WHEN c_mktsegment = 'BUILDING'
       THEN CAST(o_totalprice AS DECIMAL(12,2))
       ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS building_rev,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_rev,
  ROUND(CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
       THEN CAST(o_totalprice AS DECIMAL(12,2))
       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
    / CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 6) AS building_share
FROM orders, customer
WHERE o_custkey = c_custkey
GROUP BY 1
""",
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8-style market share: conditional-aggregate ratio per year."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    price = dec("o_totalprice")
    building = F.when(F.col("c_mktsegment") == "BUILDING", price).otherwise(
        F.lit(0).cast(MONEY)
    )
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            dsum(building, "building_rev"),
            dsum(price, "total_rev"),
            F.round(
                F.sum(building).cast("double") / F.sum(price).cast("double"), 6
            ).alias("building_share"),
        )
    )


@query(
    "set_ops_bag_semantics",
    """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_totalprice > 200000
""",
)
def set_ops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics (per-occurrence matching), the
    multiset counterpart of the distinct set ops above."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .intersectAll(o.filter(F.col("o_totalprice") > 200000).select("o_custkey"))
    )


@query(
    "window_ranking_functions",
    """
SELECT o_orderpriority, o_orderkey,
  RANK() OVER w AS rnk,
  DENSE_RANK() OVER w AS drnk,
  ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
  ROUND(CUME_DIST() OVER w, 6) AS cdist,
  NTILE(4) OVER w AS quartile,
  FIRST_VALUE(o_orderkey) OVER w AS first_key,
  LEAD(o_orderkey) OVER w AS next_key
FROM orders
WHERE o_totalprice > 450000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one deterministic window
    (unique tiebreak on o_orderkey makes every rank reproducible)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.lead("o_orderkey").over(w).alias("next_key"),
    )


@query(
    "scalar_json_functions",
    """
SELECT
  event_id,
  coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_value,
  (json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
  json_object('k', coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0),
              't', event_type) AS reserialized
FROM events
""",
)
def scalar_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction with numeric coercion, validity check,
    and re-serialization (Spark to_json and DuckDB json_object emit the
    same compact format — verified byte-identical)."""
    e = load_table(spark, sf_dir, "events")
    k = F.coalesce(F.get_json_object("props", "$.k").try_cast("bigint"), F.lit(0))
    return e.select(
        "event_id",
        k.alias("k_value"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.to_json(F.struct(k.alias("k"), F.col("event_type").alias("t"))).alias(
            "reserialized"
        ),
    )
