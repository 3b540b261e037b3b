"""Subquery coverage (SURVEY.md section 2.2 predicates / section 4 rewrites).

Reference: InSubquery/Exists/scalar subqueries (catalyst/expressions/
predicates.scala:151, subquery.scala) are decorrelated and rewritten to
joins by the optimizer (optimizer/subquery.scala:45 RewritePredicate-
Subquery -> semi/anti join; RewriteCorrelatedScalarSubquery -> left outer
join + aggregate). We express them through the SQL entry point so the
rewrite machinery itself is exercised, and the plans land on the same
join shapes a hand-written DataFrame query would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ushas_spark.io import register_views
from ushas_spark.registry import query

# Portable scaled-integer avg (see ushas_spark.oracle_exact): identical
# text runs on both engines.
_AVG_PRICE = (
    "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
    " / 100.0 / CAST(COUNT(*) AS DOUBLE)"
)

_SUBQ_IN = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
ORDER BY o_orderkey
"""


@query("subq_in", oracle=_SUBQ_IN)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) -> left semi join (reference: optimizer/subquery.scala:45)."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_IN)


_SUBQ_NOT_IN = """
SELECT c_custkey
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
ORDER BY c_custkey
"""


@query("subq_not_in", oracle=_SUBQ_NOT_IN)
def subq_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN -> null-aware anti join. o_custkey is non-nullable here, but
    the plan still uses the null-aware variant (both engines implement the
    same three-valued NOT IN semantics)."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_NOT_IN)


_SUBQ_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
"""


@query("subq_exists_correlated", oracle=_SUBQ_EXISTS)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS -> decorrelated to a semi join
    (reference: optimizer/subquery.scala:168 PullupCorrelatedPredicates)."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_EXISTS)


_SUBQ_SCALAR = f"""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.9 * (SELECT {_AVG_PRICE} FROM orders)
ORDER BY o_orderkey
"""


@query("subq_scalar", oracle=_SUBQ_SCALAR)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (single-row aggregate broadcast into
    the filter). The average uses the portable scaled-integer form so the
    threshold is bit-identical across engines."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_SCALAR)


_SUBQ_CORR_SCALAR = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice > 1.01 * (
  SELECT CAST(SUM(CAST(ROUND(p2.p_retailprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / CAST(COUNT(*) AS DOUBLE)
  FROM part p2 WHERE p2.p_brand = p.p_brand
)
ORDER BY p_partkey
"""


@query("subq_scalar_correlated", oracle=_SUBQ_CORR_SCALAR)
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-brand average) -> rewritten to an
    aggregate + left outer join (reference: RewriteCorrelatedScalarSubquery).
    The idiomatic at-scale formulation is the explicit groupBy+join; this
    exercises the automatic rewrite producing the same plan."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_CORR_SCALAR)


_SUBQ_IN_COMPOSITE = """
SELECT l_orderkey, l_partkey, l_suppkey
FROM lineitem
WHERE (l_partkey, l_suppkey) IN (
  SELECT p_partkey, s_suppkey
  FROM part, supplier
  WHERE p_size = 1 AND s_acctbal > 5000
)
ORDER BY l_orderkey, l_partkey, l_suppkey
"""

# DuckDB doesn't bind multi-column IN; the equivalent EXISTS form.
_SUBQ_IN_COMPOSITE_ORACLE = """
SELECT l_orderkey, l_partkey, l_suppkey
FROM lineitem
WHERE EXISTS (
  SELECT 1 FROM part, supplier
  WHERE p_size = 1 AND s_acctbal > 5000
    AND p_partkey = l_partkey AND s_suppkey = l_suppkey
)
ORDER BY l_orderkey, l_partkey, l_suppkey
"""


@query("subq_in_composite_key", oracle=_SUBQ_IN_COMPOSITE_ORACLE)
def subq_in_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column IN subquery (struct-typed InSubquery). The oracle uses
    the equivalent EXISTS form (DuckDB lacks row-value IN binding)."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_IN_COMPOSITE)
