"""Data profiling: the ANALYZE-grade statistics a pipeline consults
before choosing join/partition strategies.

Two operators:

- :func:`profile_table_stats` — per-column null fraction, exact
  distinct count, min/max for a fixed column set. The hand-rolled
  equivalent of ANALYZE TABLE ... FOR COLUMNS (reference:
  sql/core/src/main/scala/org/apache/spark/sql/execution/command/
  AnalyzeColumnCommand.scala), emitted as a queryable DataFrame instead
  of catalog metadata. One pass, every statistic map-side combinable
  except the exact distincts (which Spark plans via expand +
  two-phase aggregation).
- :func:`profile_join_keys` — per-key frequency skew profile of a
  prospective join column: top hot keys plus the p50/p90/p99/max of the
  key-frequency distribution. This is the number you look at before
  deciding broadcast vs salting (operators/skew.py); at 100 TB the
  frequency table is |distinct keys| rows and the quantiles are exact
  ranks over it, not approximations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query

_PROF_COLS = ["l_quantity", "l_discount", "l_linestatus", "l_returnflag"]

_STATS_ORACLE = """
WITH t AS (SELECT * FROM lineitem)
""" + "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_repr,
       CAST(MAX({c}) AS VARCHAR) AS max_repr
FROM t"""
    for c in _PROF_COLS
) + "\nORDER BY col_name"


@query("profile_table_stats", oracle=_STATS_ORACLE)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of lineitem (nulls, exact ndv, min/max)."""
    t = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in _PROF_COLS:
        parts.append(
            t.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(c).cast("string").alias("min_repr"),
                F.max(c).cast("string").alias("max_repr"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


_SKEW_KEY = "l_partkey"
_TOP_HOT = 5

_SKEW_ORACLE = f"""
WITH freq AS (
  SELECT {_SKEW_KEY} AS key, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), hot AS (
  SELECT 'hot' AS kind,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank,
         key, n
  FROM freq ORDER BY n DESC, key LIMIT {_TOP_HOT}
), ff AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS cnt FROM freq GROUP BY n
), cum AS (
  SELECT n, SUM(cnt) OVER (ORDER BY n
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(cnt) OVER () AS nk
  FROM ff
), quant AS (
  SELECT 'p' || p AS kind, CAST(p AS BIGINT) AS rank,
         CAST(NULL AS BIGINT) AS key, CAST(MIN(n) AS BIGINT) AS n
  FROM cum JOIN (VALUES (50), (90), (99)) q(p)
    ON c >= GREATEST(1, CAST(CEIL(nk * p / 100.0) AS BIGINT))
  GROUP BY p
)
SELECT * FROM hot UNION ALL SELECT * FROM quant
ORDER BY kind, rank
"""


@query("profile_join_keys", oracle=_SKEW_ORACLE)
def profile_join_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of lineitem.{_SKEW_KEY}: the {_TOP_HOT}
    hottest keys plus exact p50/p90/p99 key frequencies -- the inputs
    to the broadcast-vs-salt decision.

    Scale shape: hot keys are an orderBy+limit (TakeOrderedAndProject,
    per-partition heaps, no global sort); frequency quantiles come from
    the frequency-OF-frequencies table -- |distinct frequency values|
    rows, typically a few hundred regardless of key cardinality -- so
    the only window runs over that tiny table, never over the
    billion-key frequency table itself.
    """
    freq = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col(_SKEW_KEY).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hot = (
        freq.orderBy(F.col("n").desc(), "key")
        .limit(_TOP_HOT)
        .select(
            F.lit("hot").alias("kind"),
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), "key"))
            .cast("long")
            .alias("rank"),
            "key",
            "n",
        )
    )
    ff = freq.groupBy("n").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = W.orderBy("n").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = ff.select(
        "n",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(W.partitionBy()).alias("nk"),
    )
    pcts = spark.createDataFrame([(50,), (90,), (99,)], "p long")
    quant = (
        cum.crossJoin(F.broadcast(pcts))
        .where(
            F.col("c")
            >= F.greatest(
                F.lit(1),
                F.ceil(F.col("nk") * F.col("p") / F.lit(100.0)).cast("long"),
            )
        )
        .groupBy("p")
        .agg(F.min("n").alias("n"))
        .select(
            F.concat(F.lit("p"), F.col("p")).alias("kind"),
            F.col("p").alias("rank"),
            F.lit(None).cast("long").alias("key"),
            "n",
        )
    )
    return hot.unionByName(quant).orderBy("kind", "rank")
