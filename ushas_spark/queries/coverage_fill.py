"""Last-mile SURVEY.md section 2 rows: natural join, higher moments,
OneRowRelation, count-min sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table, register_views
from ushas_spark.registry import query


@query(
    "join_natural",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey, r_name
FROM nation NATURAL JOIN (SELECT r_regionkey AS n_regionkey, r_name FROM region)
ORDER BY n_nationkey
""",
)
def join_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN (reference: joinTypes.scala:98 NaturalJoin, resolved
    by ResolveNaturalAndUsingJoin): join columns inferred from shared
    names, emitted once."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_nationkey, n_name, n_regionkey, r_name
        FROM nation NATURAL JOIN
             (SELECT r_regionkey AS n_regionkey, r_name FROM region)
        ORDER BY n_nationkey
        """
    )


def _pow_sum(col: str, p: int, scale: float) -> str:
    expr = "(" + " * ".join([col] * p) + ")"
    return f"(CAST(SUM(CAST(ROUND({expr} * {scale}) AS BIGINT)) AS DOUBLE) / {scale})"


_MOMENTS_ORACLE = f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS DOUBLE) AS n,
       ({_pow_sum("l_quantity", 1, 100.0)}) AS s1,
       ({_pow_sum("l_quantity", 2, 100.0)}) AS s2,
       ({_pow_sum("l_quantity", 3, 100.0)}) AS s3,
       ({_pow_sum("l_quantity", 4, 100.0)}) AS s4
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("agg_higher_moments", oracle=_MOMENTS_ORACLE)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness/kurtosis inputs as exact scaled power sums (reference:
    CentralMomentAgg.scala:140-213 Skewness/Kurtosis). We pin the power
    sums (engine-exact, order-independent); the closed-form moments are
    derived from these in tests -- the engines' own streaming
    skewness/kurtosis are accumulation-order-dependent and not portable
    (same reasoning as oracle_exact.dec_stddev_samp)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")

    def pow_sum(p: int) -> F.Column:
        expr = q
        for _ in range(p - 1):
            expr = expr * q
        return F.sum(F.round(expr * 100.0).cast("long")).cast("double") / 100.0

    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("double").alias("n"),
            pow_sum(1).alias("s1"),
            pow_sum(2).alias("s2"),
            pow_sum(3).alias("s3"),
            pow_sum(4).alias("s4"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "select_without_from",
    oracle="""
SELECT 1 AS one, 'x' AS letter, CAST(2.5 AS DOUBLE) AS num,
       upper('spark') AS up, 1 + 2 * 3 AS arith
""",
)
def select_without_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT without FROM -> OneRowRelation (reference:
    basicLogicalOperators.scala:961)."""
    return spark.sql(
        "SELECT 1 AS one, 'x' AS letter, CAST(2.5 AS DOUBLE) AS num, "
        "upper('spark') AS up, 1 + 2 * 3 AS arith"
    )


@query("agg_count_min_sketch")  # binary sketch: rows-only + golden test
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountMinSketch aggregate (reference: CountMinSketchAgg.scala:47):
    seeded -> deterministic within Spark; serialised sketch bytes are
    engine-specific so the gate records rows-only and the unit test pins
    the hex digest."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.hex(
            F.expr("count_min_sketch(l_returnflag, 0.01d, 0.95d, 42)")
        ).alias("sketch_hex")
    )
