"""Join-type coverage (SURVEY.md section 2.3).

The reference supports Inner/Cross/LeftOuter/RightOuter/FullOuter/LeftSemi/
LeftAnti/Natural/Using joins (reference: sql/catalyst/src/main/scala/org/
apache/spark/sql/catalyst/plans/joinTypes.scala:60-104) with physical
selection broadcast-hash / sort-merge / shuffled-hash / broadcast-nested-
loop / cartesian (reference: execution/SparkStrategies.scala:148
JoinSelection). All are builtin in PySpark; these queries pin their
semantics against the DuckDB oracle and document the scale-appropriate
physical strategy for each shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query


@query(
    "join_inner_dim",
    oracle="""
SELECT s_name, n_name, r_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
ORDER BY s_name
""",
)
def join_inner_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-chain inner join: both dims broadcast (constant-size at
    any SF), so the fact side streams with zero shuffle
    (reference: execution/joins/BroadcastHashJoinExec.scala:40)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_name", "n_name", "r_name")
        .orderBy("s_name")
    )


@query(
    "join_left_outer",
    oracle="""
SELECT n_name, s_suppkey, s_name
FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
ORDER BY n_name, s_suppkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER preserving unmatched nations (NULL supplier columns)."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        nation.join(supp, nation.n_nationkey == supp.s_nationkey, "left")
        .select("n_name", "s_suppkey", "s_name")
        .orderBy("n_name", "s_suppkey")
    )


@query(
    "join_right_outer",
    oracle="""
SELECT n_name, s_suppkey, s_name
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
ORDER BY n_name, s_suppkey
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right")
        .select("n_name", "s_suppkey", "s_name")
        .orderBy("n_name", "s_suppkey")
    )


@query(
    "join_full_outer",
    oracle="""
WITH o AS (SELECT o_orderstatus AS status, COUNT(*) AS n_orders
           FROM orders GROUP BY o_orderstatus),
     l AS (SELECT l_returnflag AS status, COUNT(*) AS n_lines
           FROM lineitem GROUP BY l_returnflag)
SELECT COALESCE(o.status, l.status) AS status, n_orders, n_lines
FROM o FULL OUTER JOIN l ON o.status = l.status
ORDER BY status
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with unmatched rows on both sides ('O'/'P' only in
    orders, 'A'/'R' only in lineitem). At scale: both sides pre-aggregated
    before the join, so the shuffle moves group counts, not raw rows."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("n_orders"))
    )
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("status"))
        .agg(F.count("*").alias("n_lines"))
    )
    return (
        orders.join(lines, "status", "full_outer")
        .select("status", "n_orders", "n_lines")
        .orderBy("status")
    )


@query(
    "join_left_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
ORDER BY c_custkey
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI == EXISTS; output columns come only from the left side
    (reference: joinTypes.scala:82). Semi joins short-circuit on first
    match, so the build side can be deduplicated -- Spark does this."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_left_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI == NOT EXISTS (reference: joinTypes.scala:86).

    The right side is filtered (urgent orders only): every customer has
    *some* order in this corpus, so the unfiltered anti join is vacuously
    empty and would prove nothing."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
SELECT r_name, n_name
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (reference: execution/joins/
    CartesianProductExec.scala:60, guarded by CheckCartesianProducts).
    Only ever sane between constant-size dimensions; crossJoin makes the
    intent explicit so the guard rule does not reject the plan."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.crossJoin(nation).select("r_name", "n_name").orderBy("r_name", "n_name")
    )


@query(
    "join_theta_nonequi",
    oracle="""
SELECT s_suppkey, COUNT(*) AS n_close
FROM supplier JOIN customer
  ON c_acctbal >= s_acctbal - 100 AND c_acctbal < s_acctbal + 100
GROUP BY s_suppkey
ORDER BY s_suppkey
""",
)
def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (band) join -> broadcast-nested-loop (reference:
    execution/joins/BroadcastNestedLoopJoinExec.scala:32). The small side
    (supplier) is broadcast so the big side never shuffles; for fact-fact
    band joins use the bucketize-then-equi-join pattern instead
    (see ushas_spark.operators.asof)."""
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    cond = (cust.c_acctbal >= supp.s_acctbal - 100) & (cust.c_acctbal < supp.s_acctbal + 100)
    return (
        cust.join(F.broadcast(supp), cond)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close"))
        .orderBy("s_suppkey")
    )


@query(
    "join_using_natural",
    oracle="""
SELECT n_nationkey, n_name, count(c_custkey) AS n_customers
FROM nation LEFT JOIN (SELECT c_custkey, c_nationkey AS n_nationkey FROM customer)
  USING (n_nationkey)
GROUP BY n_nationkey, n_name
ORDER BY n_nationkey
""",
)
def join_using_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USING-style join (single shared-name key column in the output;
    reference: joinTypes.scala:104 UsingJoin). In the DataFrame API,
    passing the column name as the join spec gives USING semantics."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("n_nationkey")
    )
    return (
        nation.join(cust, "n_nationkey", "left")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy("n_nationkey")
    )


@query(
    "join_self_pairs",
    oracle="""
SELECT a.l_orderkey, COUNT(*) AS n_pairs
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
GROUP BY a.l_orderkey
HAVING COUNT(*) >= 10
ORDER BY a.l_orderkey
""",
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join on the fact table. Safe at scale: the quadratic blowup is
    bounded per order (<= 7 lines each), and both sides shuffle on the
    same key so AQE can pick a co-partitioned plan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .groupBy(F.col("a.l_orderkey").alias("l_orderkey"))
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= 10)
        .orderBy("l_orderkey")
    )


_TIER_ORACLE = """
WITH tiers(tier, lo, hi) AS (
  VALUES ('bronze', 0, 100000),
         ('silver', 100000, 250000),
         ('gold', 250000, 400000),
         ('platinum', 400000, 1000000000)
)
SELECT t.tier,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_x100
FROM orders o
JOIN tiers t ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
GROUP BY t.tier
ORDER BY t.tier
"""


@query("join_tier_lookup", oracle=_TIER_ORACLE)
def join_tier_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-range dimension lookup: classify every order into a
    price tier from a tiny range table. This is the one theta-join
    shape where BroadcastNestedLoopJoin is the RIGHT plan -- the build
    side is a handful of rows, so the 'nested loop' is a 4-iteration
    inner loop per probe row and the fact streams once with no
    shuffle. The interval/band machinery (join_range_banded,
    join_interval_overlap) exists for when BOTH sides are large; a
    banded formulation here would only add an exchange.
    """
    o = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        [
            ("bronze", 0, 100_000),
            ("silver", 100_000, 250_000),
            ("gold", 250_000, 400_000),
            ("platinum", 400_000, 1_000_000_000),
        ],
        "tier string, lo long, hi long",
    )
    return (
        o.join(
            F.broadcast(tiers),
            (o.o_totalprice >= tiers.lo) & (o.o_totalprice < tiers.hi),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("rev_x100"),
        )
        .orderBy("tier")
    )
