"""Subquery / decorrelation coverage (SURVEY.md §2.7): correlated EXISTS,
NOT EXISTS, IN with HAVING, NOT IN, correlated scalar subqueries,
uncorrelated scalar thresholds, disjunctive join filters — the TPC-H
q2/q4/q12/q14/q16/q18/q19/q22 patterns adapted to this star schema.

Spark-first: each is written with the DataFrame API's join-flavored
decorrelation (semi/anti joins, pre-aggregated IN-lists, broadcast scalar
thresholds) — the plan Catalyst would decorrelate the SQL into, stated
explicitly so the shuffle shape is visible and pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import MONEY, RATE, dec, dsum, load_table


@query(
    "q4_late_shipments",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
)
def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a non-equi correlation predicate -> left-semi
    join carrying the inequality."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q12_priority_by_linestatus",
    """
SELECT
  l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # orders is fact-sized: no broadcast hint — shuffle join, or AQE's
    # runtime broadcast when the filtered side turns out small.
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_count"),
        )
    )


@query(
    "q14_promo_revenue_ratio",
    """
SELECT ROUND(
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
  6) AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00'
""",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio over a broadcast dimension join."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-02-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q16_supplier_count_by_part",
    """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#13'
  AND p_size IN (1, 9, 19, 29, 39, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%'
  )
GROUP BY p_brand, p_size
""",
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (uncorrelated) -> broadcast anti join; distinct-count agg."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 19, 29, 39, 49)
    )
    l = load_table(spark, sf_dir, "lineitem")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    return (
        l.join(bad_supp, l.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume_orders",
    """
SELECT c_custkey, c_name, o_orderkey,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
  )
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over a grouped-HAVING subquery -> pre-aggregate then semi join
    (the aggregation runs once, not per outer row)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    # `big` (orders over the HAVING threshold) is tiny at any realistic
    # selectivity but still SCALES with sf, so it carries no hint — AQE
    # broadcasts it from its measured runtime size; orders/customer are
    # fact-sized, AQE decides those too.
    return (
        l.join(
            big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi"
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(dsum(dec("l_quantity"), "total_qty"))
    )


@query(
    "q19_disjunctive_join_filter",
    """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND (
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
  )
""",
)
def q19_disjunctive_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides — Catalyst extracts the common
    p_partkey equi-key and keeps the disjunction as a post-join filter."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    disc = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(disc, "revenue"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q22_dormant_rich_customers",
    """
SELECT CAST(c_nationkey % 5 AS INT) AS seg,
       COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 400000
  )
GROUP BY 1
""",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar threshold (broadcast single row via cross join —
    never a driver-side collect) + NOT EXISTS anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "thresh"
            )
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("thresh"))
        .join(
            o.filter(F.col("o_totalprice") > 400000),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .withColumn("seg", (F.col("c_nationkey") % 5).cast("int"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
    )


@query(
    "q2_best_supplier_per_part",
    """
SELECT DISTINCT p_partkey, p_name, s.s_suppkey, s.s_acctbal
FROM part, supplier s, lineitem
WHERE p_partkey = l_partkey
  AND s.s_suppkey = l_suppkey
  AND p_size > 45
  AND s.s_acctbal = (
    SELECT MAX(s2.s_acctbal)
    FROM supplier s2, lineitem l2
    WHERE l2.l_partkey = p_partkey AND l2.l_suppkey = s2.s_suppkey
  )
GROUP BY p_partkey, p_name, s.s_suppkey, s.s_acctbal
""",
)
def q2_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar MAX subquery -> decorrelated into a per-part MAX
    WINDOW over the distinct (part, supplier) pairs (r12: was a groupBy
    + join-back, which re-expanded the distinct subtree on both join
    sides and paid an extra exchange — the window computes the same max
    on the same partitioning in one pass)."""
    from pyspark.sql.window import Window

    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    part_supp = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .select("l_partkey", "s_suppkey", "s_acctbal")
        .distinct()
    )
    best_bal = F.max("s_acctbal").over(Window.partitionBy("l_partkey"))
    return (
        part_supp.withColumn("best_bal", best_bal)
        .filter(F.col("s_acctbal") == F.col("best_bal"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_acctbal")
        .distinct()
    )
