"""The remaining TPC-H patterns (q7/q8/q9/q11/q13/q15/q17/q20/q21) adapted
to this star schema (SURVEY.md §2.7 scope: joins, outer joins, decorrelated
EXISTS/NOT EXISTS, scalar thresholds — all ClickHouse-side in the
reference, first-class here). With q8 the registry covers all 22 TPC-H
query patterns.

Schema adaptations (the synthetic tables are trimmed TPC-H): no
``partsupp`` — q11/q20 use per-(supplier, part) lineitem aggregates as
the stock proxy; no commit/receipt dates — q21's "kept waiting" is
l_shipdate > o_orderdate + 60 days; no p_container/o_comment — nearby
columns stand in.

Determinism: every money aggregate follows util.py's DECIMAL-exact
strategy, and threshold comparisons are multiplied through so both
engines compare exact decimals (never a float division result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query
from go_nats_to_clickhouse_spark.queries.util import RATE, dec, dsum, load_table


def _disc() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE))


_DISC_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


@query(
    "q7_volume_shipping",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         {_DISC_SQL} AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7: bilateral trade volume between two nations by ship year.

    Scale shape: nation is broadcast twice (aliased); the one real
    shuffle is lineitem->orders->customer on the order/customer keys.
    The nation-pair filter lands on supplier/customer BEFORE the fact
    joins, so only the two nations' rows ever shuffle.
    """
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    s2 = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    c2 = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    return (
        l.join(s2, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c2, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_disc(), "revenue"))
    )


@query(
    "q9_product_type_profit",
    f"""
SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         {_DISC_SQL}
           - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%an%'
) profit
GROUP BY nation, o_year
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 adapted: profit (revenue minus retailprice*qty cost proxy —
    no partsupp.ps_supplycost in this schema) by supplier nation and order
    year, for parts matching a name pattern.

    Scale shape: part (name-filtered) and supplier+nation broadcast into
    the lineitem scan; the only big shuffle is lineitem->orders.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%an%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    sn = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    amount = _disc() - dec("p_retailprice") * dec("l_quantity")
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("nation", "o_year")
        .agg(dsum(amount, "sum_profit"))
    )


@query(
    "q11_important_stock",
    """
WITH pv AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_d
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
  )
  GROUP BY l_partkey
)
SELECT p_partkey, CAST(ROUND(value_d, 2) AS DOUBLE) AS part_value
FROM pv
WHERE 1000 * value_d > (SELECT SUM(value_d) FROM pv)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 adapted: per-part shipped value (lineitem proxy — no
    partsupp) restricted to one region's suppliers, keeping parts above
    0.1% of the total.

    The fraction threshold is multiplied through (1000 * value > total)
    so both engines compare exact decimals. The grand total is a 1-row
    broadcast cross join — never a driver-side collect.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    l = load_table(spark, sf_dir, "lineitem")
    region_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    pv = (
        l.join(region_supp, l.l_suppkey == region_supp.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(dec("l_extendedprice")).alias("value_d"))
    )
    total = pv.agg(F.sum("value_d").alias("total_d"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.lit(1000) * F.col("value_d") > F.col("total_d"))
        .select(
            "p_partkey", F.round("value_d", 2).cast("double").alias("part_value")
        )
    )


@query(
    "q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13: order-count histogram over a LEFT OUTER join (customers
    with zero qualifying orders land in the c_count=0 bucket — the outer
    join is semantically load-bearing, COUNT(col) skips its nulls).

    Scale shape: shuffle join on custkey, then a two-level aggregation;
    the second groupBy is over ~dozens of distinct counts, so the final
    shuffle is trivial.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_DISC_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15: supplier(s) with the maximum quarterly revenue. The
    revenue CTE is computed once and reused for both the per-supplier
    rows and the MAX threshold (in Spark: one DataFrame referenced twice;
    the max is a 1-row broadcast). Equality is tested on the exact
    decimal, so ties are engine-independent."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc()).alias("total_rev")
    )
    best = revenue.agg(F.max("total_rev").alias("best_rev"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
FROM lineitem, part, per_part
WHERE p_partkey = lineitem.l_partkey
  AND per_part.l_partkey = lineitem.l_partkey
  AND p_brand = 'Brand#23'
  AND 5 * CAST(l_quantity AS DECIMAL(12,2)) * cnt < sum_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17: revenue from orders far below a part's average quantity.
    The correlated AVG subquery is decorrelated into a per-part
    (SUM, COUNT) aggregate joined back, and the `qty < 0.2 * avg`
    comparison is multiplied through to `5 * qty * cnt < sum` — an exact
    decimal predicate identical in both engines (a float division there
    can flip rows on last-bit differences)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part = l.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum(dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pp_partkey"))
        .filter(F.lit(5) * dec("l_quantity") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly")
        )
    )


@query(
    "q20_potential_part_promotion",
    """
WITH sp AS (
  SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM sp WHERE qty > 40)
""",
)
def q20_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 adapted: suppliers who moved a large volume of a named
    part family in one year (shipped-quantity proxy — no
    partsupp.ps_availqty). Nested IN chain decorrelated to: part-filter
    broadcast semi join -> (supp, part) aggregate -> HAVING -> semi join
    into supplier."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    big = (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return s.join(
        big, s.s_suppkey == big.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q21_waiting_suppliers",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 adapted: the sole late supplier in multi-supplier
    finished orders ("late" = shipped >60 days after the order date —
    this schema has no commit/receipt dates).

    The EXISTS / NOT EXISTS pair is decorrelated into one per-order
    aggregate: n_supp = distinct suppliers, n_late = distinct LATE
    suppliers; a qualifying row is late with n_supp > 1 and n_late = 1.
    One pass over lineitem->orders replaces two correlated rescans —
    at 100 TB the correlated form would re-scan the fact per outer row.
    """
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    lo = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        lo.filter(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q8_national_market_share",
    f"""
SELECT o_year,
       CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                           ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
         AS nation_rev,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_rev,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         {_DISC_SQL} AS volume,
         n2.n_name AS supp_nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA'
    AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                        AND TIMESTAMP '1996-12-31 00:00:00'
    AND p_type = 'STANDARD'
) all_nations
GROUP BY o_year
""",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8: one nation's share of regional market revenue by order
    year — the last of the 22 TPC-H patterns (the full 8-table join with
    nation in two roles). Adapted predicates for this schema's domains:
    p_type 'STANDARD', region 'AMERICA', supplier nation 'NATION_1'.

    Scale shape: every dimension side is broadcast — part (filtered to
    one type BEFORE the fact join, so the fact scan drops ~4/5 of rows
    on a broadcast semi-ish probe), supplier+nation(n2), and
    customer+nation(n1)+region (region filter prunes customers to one
    region's ~1/5 before the orders join). The only real shuffle is
    lineitem->orders on the order key, with the orders side pre-pruned
    by both the date range and the region-filtered customer broadcast.
    The share is a conditional decimal aggregate — one pass, no second
    join against a totals subquery.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    n1 = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    s2 = s.join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    c2 = c.join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key")).select(
        "c_custkey"
    )
    volume = _disc()
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_1", volume
    ).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s2, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c2, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            dsum(nation_vol, "nation_rev"),
            dsum(volume, "total_rev"),
            F.round(
                F.sum(nation_vol).cast("double") / F.sum(volume).cast("double"), 6
            ).alias("mkt_share"),
        )
    )
