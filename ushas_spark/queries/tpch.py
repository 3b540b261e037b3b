"""Flagship TPC-H-style analytical queries on the driver star schema.

These exercise the full scan -> filter -> join -> aggregate -> sort -> limit
vertical (reference execution surface: SparkStrategies.scala JoinSelection
:148 / Aggregation :401, TakeOrderedAndProjectExec execution/limit.scala:124).

Scale notes (100 TB design):
- region/nation are constant-size dimensions -> always broadcast
  (reference broadcast planning: execution/joins/BroadcastHashJoinExec.scala:40).
- Fact-fact joins (orders x lineitem) shuffle on the join key; AQE handles
  skew and coalescing. No driver-side collection anywhere.
- Aggregations are expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the shuffle
  (reference: execution/aggregate/AggUtils.scala planAggregateWithoutDistinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.oracle_exact import (
    dec_avg,
    dec_sum,
    sql_dec_avg,
    sql_dec_sum,
)
from ushas_spark.registry import query

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dec_sum("l_quantity", "sum_qty")},
  {sql_dec_sum("l_extendedprice", "sum_base_price")},
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {sql_dec_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {sql_dec_avg("l_quantity", "avg_qty")},
  {sql_dec_avg("l_extendedprice", "avg_price")},
  {sql_dec_avg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide multi-aggregate groupBy over the fact table.

    Plan shape to verify at scale: parquet scan with PushedFilters on
    l_shipdate -> partial hash agg -> shuffle on (returnflag, linestatus)
    [tiny key space -> 6 groups, partials make the shuffle negligible]
    -> final hash agg. Whole-stage codegen end to end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity"), "sum_qty"),
            dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg(F.col("l_quantity"), "avg_qty"),
            dec_avg(F.col("l_extendedprice"), "avg_price"),
            dec_avg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")},
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter -> fact join -> top-k.

    customer is small relative to the facts -> explicit broadcast hint so
    the orders probe avoids a shuffle; orders x lineitem is the one
    shuffle join (both sides partitioned on orderkey). orderBy+limit fuses
    into TakeOrderedAndProject (per-partition heaps, no global sort;
    reference: execution/limit.scala:124).
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


_Q5_ORACLE = f"""
SELECT
  n_name,
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-way join. region/nation/supplier broadcast; the two
    fact joins shuffle on their keys. Catalyst reorders the inner-join
    chain (reference: optimizer/joins.scala:38 ReorderJoin).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


_Q6_ORACLE = f"""
SELECT {sql_dec_sum("l_extendedprice * l_discount", "revenue")}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate must reach the
    parquet reader (check .explain for PushedFilters on all four)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_priority_with_returns", oracle=_Q4_ORACLE)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-filtered aggregation -> left semi join
    (the data lacks commit/receipt dates; returnflag stands in)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q14_ORACLE = f"""
SELECT
  CAST(SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0.0 END * 10000) AS BIGINT)) AS DOUBLE)
  / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT)) AS DOUBLE) * 100.0 AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
"""


@query("q14_promo_effect", oracle=_Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-aggregate ratio over a fact-dim join. Both
    sums use the exact scaled-integer form, so the ratio divides two
    identical numbers in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    num = F.sum(F.round(promo * 10000).cast("long")).cast("double")
    den = F.sum(F.round(rev * 10000).cast("long")).cast("double")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (num / den * 100.0).alias("promo_revenue_pct")
    )


_Q18_ORACLE = f"""
SELECT c_custkey, o_orderkey,
       {sql_dec_sum("l_quantity", "total_qty", scale=2)}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey
HAVING SUM(l_quantity) > 150
ORDER BY total_qty DESC, o_orderkey
"""


@query("q18_large_volume", oracle=_Q18_ORACLE)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-by + HAVING over a two-fact join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(
            dec_sum(F.col("l_quantity"), "total_qty", scale=2),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 150)
        .drop("_raw_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


_Q10_ORACLE = f"""
SELECT
  c_custkey,
  c_name,
  {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")},
  c_acctbal,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: join-agg-topk with a wide group-by key."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dec_sum("volume", "revenue")}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12')
      OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bi-directional nation-pair revenue by ship year.

    Scale shape: two broadcast joins against the 25-row nation dim plus a
    disjunctive pair filter applied AFTER both joins (Catalyst cannot
    split an OR across tables); the fact-fact joins shuffle on their keys.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12")
    ) | ((F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                     THEN CAST(ROUND(volume * 10000) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(ROUND(volume * 10000) AS BIGINT)) AS DOUBLE)
       AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — a conditional-sum / total-sum
    ratio per year over a 7-table join.

    Both sums run on the scaled-integer form so the final ratio divides
    two numbers that are bit-identical across engines and partitionings.
    All dimension joins (part-filtered, nation x2, region) broadcast;
    the only shuffles are the fact-fact joins.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume_scaled = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", volume_scaled).otherwise(F.lit(0))
    ).cast("double")
    den = F.sum(volume_scaled).cast("double")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg((num / den).alias("mkt_share"))
        .orderBy("o_year")
    )


_Q9_ORACLE = f"""
SELECT nation, o_year, {sql_dec_sum("amount", "sum_profit")}
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q9_product_type_profit", oracle=_Q9_ORACLE)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation x order year for parts
    matching a name pattern (no partsupp table in this corpus, so amount
    omits the supplycost term; the join/agg shape is what matters).

    The LIKE-filtered part dim broadcasts; nation broadcasts; lineitem
    drives the shuffled joins to orders.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum(F.col("amount"), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation over an outer join, where the
    join predicate (not a WHERE filter!) excludes some orders, and
    customers with zero surviving orders must still appear with count 0
    — COUNT(col) over the null-extended rows, never COUNT(*).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dec_sum("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: CTE reused twice — once joined, once reduced to a
    scalar MAX — selecting the top-revenue supplier(s).

    The revenue CTE is computed once and reused (same DataFrame object;
    Spark reuses the exchange). The MAX comparison is on the
    scaled-integer-derived double, so equality is exact cross-engine.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    # MAX over the whole (per-supplier, i.e. tiny) aggregate via an empty
    # window: ONE lineitem scan instead of recomputing the aggregate under
    # a scalar subquery. The single-partition window is safe because its
    # input is |suppliers| rows, not fact rows.
    with_max = revenue.withColumn(
        "max_revenue", F.max("total_revenue").over(Window.partitionBy())
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        with_max.filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_parts_supplier_counts", oracle=_Q16_ORACLE)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per part attributes with a
    NOT IN exclusion subquery (negative-balance suppliers stand in for
    the spec's complaint suppliers; lineitem stands in for partsupp).

    NOT IN on a non-nullable key plans as a broadcast anti join; the
    distinct count is Catalyst's two-phase distinct-aggregate expansion.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_Q17_ORACLE = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
       / 10000.0 / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


@query("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar aggregate (per-part average quantity)
    gating the fact rows — decorrelated by hand into a join against the
    per-part aggregate, which is exactly Catalyst's own rewrite.

    AVG(l_quantity) is deterministic cross-engine here: quantities are
    small integers in doubles, so the sum is exact in IEEE double and
    the single division is reproducible. avg_yearly divides the 7-year
    window to keep the classic output shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 10000).cast("long")).cast(
                    "double"
                )
                / 10000.0
                / 7.0
            ).alias("avg_yearly")
        )
    )


_Q19_ORACLE = f"""
SELECT {sql_dec_sum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@query("q19_discounted_revenue", oracle=_Q19_ORACLE)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive range predicates across the
    join — the classic pushdown test. Catalyst extracts the common
    per-table residuals (p_brand IN (...), p_size >= 1, quantity range
    hull) below the join while keeping the full OR as a post-join filter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


_Q22_ORACLE = """
SELECT cust_group, COUNT(*) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS totacctbal
FROM (
  SELECT CAST(c_custkey % 10 AS BIGINT) AS cust_group, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
) custsale
GROUP BY cust_group
ORDER BY cust_group
"""


@query("q22_global_sales_opportunity", oracle=_Q22_ORACLE)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (the corpus has no c_phone, so c_custkey % 10 stands in for
    the country-code group).

    Two subqueries, two plans: the uncorrelated AVG becomes a broadcast
    scalar; NOT EXISTS becomes a left anti join against the date-filtered
    orders. AVG(c_acctbal) is float-order-dependent in general, but both
    engines sum ~thousands of 2-dp values exactly in double here; the
    anti-join then makes any boundary row binary — verified stable at
    sf0.01/0.001.
    """
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01 00:00:00").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select(
            (F.col("c_custkey") % 10).cast("long").alias("cust_group"),
            F.col("c_acctbal"),
        )
        .groupBy("cust_group")
        .agg(
            F.count("*").alias("numcust"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("totacctbal"),
        )
        .orderBy("cust_group")
    )


_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("q12_shipmode_priority", oracle=_Q12_ORACLE)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional integer counts over an orders-lineitem
    join (l_linestatus stands in for the missing l_shipmode). Integer
    CASE sums are exact on any engine -- no scaled-decimal machinery."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("q21_suppliers_who_kept_waiting", oracle=_Q21_ORACLE)
def q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame self-join -- a correlated EXISTS
    (other suppliers contributed to the order) AND NOT EXISTS (none of
    them also returned) against the same fact table (returnflag stands in
    for the missing commit/receipt-date lateness test).

    Expressed via SQL so Catalyst performs both decorrelations: the
    EXISTS becomes a left semi and the NOT EXISTS a left anti join, each
    shuffling on l_orderkey -- three co-partitioned joins at scale, no
    per-row subquery execution.
    """
    from ushas_spark.queries.subqueries import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q21_ORACLE)


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q20: the three shapes that need the partsupp table the corpus
# lacks. partsupp is DERIVED identically in both engines from lineitem:
# ps_supplycost = MIN(l_extendedprice / l_quantity)   (per-row IEEE division
# then MIN -- comparison-only, so bit-portable), ps_availqty =
# SUM(l_quantity) (integral-valued doubles < 2^53 -- exact in any
# accumulation order). This keeps all three classic plan shapes testable:
# correlated-min (Q2), HAVING-vs-global-aggregate (Q11), nested
# IN + correlated scalar aggregate (Q20).

_PARTSUPP_CTE = """WITH partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         SUM(l_quantity) AS ps_availqty
  FROM lineitem GROUP BY 1, 2)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the _PARTSUPP_CTE derivation (see block comment)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_availqty"),
    )


def _partsupp_europe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp joined to its supplier's nation, filtered to EUROPE.

    region/nation are constant-size -> broadcast; the only shuffle is the
    partsupp aggregation itself.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = _partsupp(spark, sf_dir)
    return ps.join(eu_sup, ps.ps_suppkey == eu_sup.s_suppkey)


_Q2_ORACLE = _PARTSUPP_CTE + """
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps.ps_suppkey
FROM partsupp ps
JOIN part ON p_partkey = ps.ps_partkey
JOIN supplier ON s_suppkey = ps.ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size <= 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
  AND ps.ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps.ps_suppkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest EUROPE supplier per part (correlated MIN
    subquery). The oracle keeps the textbook correlated scalar subquery;
    ours computes the per-part minimum with a window over the SAME joined
    relation -- one scan + one window shuffle on ps_partkey instead of
    re-executing the 4-way join per the decorrelated plan (the q15
    exchange-reuse lesson). MIN over doubles is comparison-only, so the
    equality filter selects bit-identical rows on both engines.
    (reference analogue: correlated subquery rewrite in
    catalyst/optimizer/subquery.scala RewriteCorrelatedScalarSubquery)
    """
    from pyspark.sql import Window as W

    eu = _partsupp_europe(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    best = eu.withColumn(
        "_min_cost", F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    ).filter(F.col("ps_supplycost") == F.col("_min_cost"))
    return (
        best.join(F.broadcast(part), best.ps_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "ps_suppkey")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "ps_suppkey"
        )
        .limit(100)
    )


_Q11_SCALED = "SUM(CAST(ROUND(ps_supplycost * ps_availqty * 10000) AS BIGINT))"

_Q11_ORACLE = _PARTSUPP_CTE + f"""
SELECT ps_partkey,
       CAST({_Q11_SCALED} AS DOUBLE) / 10000.0 AS value_sum
FROM partsupp
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY ps_partkey
HAVING CAST({_Q11_SCALED} AS DOUBLE) >
  (SELECT CAST({_Q11_SCALED} AS DOUBLE) * 2.0 / COUNT(DISTINCT ps_partkey)
   FROM partsupp
   JOIN supplier ON ps_suppkey = s_suppkey
   JOIN nation ON s_nationkey = n_nationkey
   JOIN region ON n_regionkey = r_regionkey
   WHERE r_name = 'EUROPE')
ORDER BY value_sum DESC, ps_partkey
"""


@query("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value vs a fraction of the
    GLOBAL value (HAVING against a scalar aggregate of the same relation).
    The oracle re-aggregates in a scalar subquery; ours materialises the
    grouped relation once (localCheckpoint -- one lineitem scan total),
    reduces it to a 1-row global sum through a normal partial->final
    aggregate, and broadcasts that row back. No empty-partition window
    (which would move EVERY per-part row to a single task -- a wall at
    billions of parts) and no second scan of the fact table. Value sums
    use exact scaled-integer partials on both sides, so the > threshold
    comparison is bit-portable.

    Threshold: TPC-H scales Q11's FRACTION by 1/SF; a fixed 0.001 goes
    vacuous as the part count grows (at sf0.1 no part holds 0.1% of
    total). The portable equivalent is value > 2x the AVERAGE per-part
    share (2/n_parts), which discriminates identically at every SF.
    """
    eu = _partsupp_europe(spark, sf_dir)
    scaled = F.round(
        F.col("ps_supplycost") * F.col("ps_availqty") * 10000
    ).cast("long")
    per_part = eu.groupBy("ps_partkey").agg(F.sum(scaled).alias("_s"))
    from ushas_spark.durability import materialize
    per_part = materialize(per_part)
    total = per_part.agg(
        F.sum("_s").alias("_total"), F.count("*").alias("_nparts")
    )
    with_total = per_part.join(F.broadcast(total))
    return (
        with_total.filter(
            F.col("_s").cast("double")
            > F.col("_total").cast("double") * 2.0 / F.col("_nparts")
        )
        .select(
            "ps_partkey",
            (F.col("_s").cast("double") / 10000.0).alias("value_sum"),
        )
        .orderBy(F.col("value_sum").desc(), "ps_partkey")
    )


_Q20_ORACLE = _PARTSUPP_CTE + """
SELECT s_name, s_suppkey
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND s_suppkey IN (
  SELECT ps_suppkey FROM partsupp
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND ps_availqty > (SELECT 5.0 * SUM(l_quantity) FROM lineitem
                       WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                         AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                         AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'))
ORDER BY s_name, s_suppkey
"""


@query("q20_excess_stock_suppliers", oracle=_Q20_ORACLE)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries with a correlated scalar
    aggregate threshold (suppliers of 'small%' parts whose stock exceeds
    5x their 1997 shipments -- the multiplier is retuned for this data's
    date spread so the filter actually discriminates; at the classic 0.5
    every supplier passes because availqty spans all seven years).

    Run through spark.sql so Catalyst performs BOTH decorrelations: the
    IN becomes a left semi join and the correlated SUM a co-partitioned
    aggregate + left outer join (reference: catalyst/optimizer/
    subquery.scala PullupCorrelatedPredicates / RewritePredicateSubquery)
    -- every join shuffles on (partkey, suppkey) or suppkey, nothing
    executes per-row. Empty correlated groups yield NULL and drop out,
    matching DuckDB.
    """
    from ushas_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q20_ORACLE)
