"""Set-operation coverage (SURVEY.md section 2.7).

Reference: Union (basicLogicalOperators.scala:212), Intersect/Except with
ALL variants rewritten by the optimizer to semi/anti joins or
count-replicated unions (Optimizer.scala:1429 ReplaceIntersectWithSemiJoin,
:1450 ReplaceExceptWithAntiJoin, :1490 RewriteExceptAll, :1547
RewriteIntersectAll). All builtin in PySpark; these pin the semantics --
especially the ALL variants' multiplicity rules -- against DuckDB.

Scale note: UNION is shuffle-free (partition concatenation); INTERSECT /
EXCEPT compile to shuffles on the full row -- project to the needed
columns first, exactly like these queries do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "setop_union_all",
    oracle="""
SELECT nationkey, COUNT(*) AS n
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
GROUP BY nationkey
ORDER BY nationkey
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (multi-child Union node; by-position column matching)."""
    return (
        _cust_nations(spark, sf_dir)
        .union(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy("nationkey")
    )


@query(
    "setop_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT == union + distinct (Optimizer rewrites to aggregate)."""
    return (
        _cust_nations(spark, sf_dir)
        .union(_supp_nations(spark, sf_dir))
        .distinct()
        .orderBy("nationkey")
    )


@query(
    "setop_union_by_name",
    oracle="""
SELECT nationkey, acctbal FROM (
  SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
)
ORDER BY nationkey, acctbal
""",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema aligned by column NAME not position -- the two
    inputs deliberately present their columns in opposite order."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("acctbal"), F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).orderBy("nationkey", "acctbal")


@query(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) -> left-semi join rewrite
    (reference: Optimizer.scala:1429)."""
    return (
        _cust_nations(spark, sf_dir)
        .intersect(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@query(
    "setop_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: multiplicity = min(count_left, count_right)
    (reference: Optimizer.scala:1547 RewriteIntersectAll -- implemented as
    a count-comparing generate over a full outer aggregated join)."""
    return (
        _cust_nations(spark, sf_dir)
        .intersectAll(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@query(
    "setop_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 9000
ORDER BY custkey
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) -> left-anti join rewrite
    (reference: Optimizer.scala:1450)."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.subtract(c).orderBy("custkey")


@query(
    "setop_except_all",
    oracle="""
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 1
EXCEPT ALL
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_linenumber = 2
ORDER BY suppkey
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiplicity = max(0, count_left - count_right)
    (reference: Optimizer.scala:1490 RewriteExceptAll -- sum-of-signs
    replication trick)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_linenumber") == 2).select(F.col("l_suppkey").alias("suppkey"))
    return a.exceptAll(b).orderBy("suppkey")
