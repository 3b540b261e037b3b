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
), ranked AS (
  SELECT key, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, key) AS hot_rank,
         ROW_NUMBER() OVER (ORDER BY n, key) AS asc_rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS nk
  FROM freq
)
SELECT 'hot' AS kind, hot_rank AS rank, key, n FROM ranked
WHERE hot_rank <= {_TOP_HOT}
UNION ALL
SELECT 'p' || p AS kind, p AS rank, key, n FROM ranked
JOIN (VALUES (50), (90), (99)) q(p)
  ON asc_rank = GREATEST(1, CAST(CEIL(nk * p / 100.0) AS BIGINT))
ORDER BY kind, rank
"""


@query("profile_join_keys", oracle=_SKEW_ORACLE)
def profile_join_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of lineitem.{_SKEW_KEY}: the {_TOP_HOT}
    hottest keys plus exact p50/p90/p99 key frequencies -- the inputs
    to the broadcast-vs-salt decision."""
    freq = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col(_SKEW_KEY).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = freq.select(
        "key",
        "n",
        F.row_number().over(W.orderBy(F.col("n").desc(), "key")).alias("hot_rank"),
        F.row_number().over(W.orderBy("n", "key")).alias("asc_rank"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nk"),
    )
    hot = ranked.where(F.col("hot_rank") <= _TOP_HOT).select(
        F.lit("hot").alias("kind"),
        F.col("hot_rank").cast("long").alias("rank"),
        "key",
        "n",
    )
    pcts = spark.createDataFrame([(50,), (90,), (99,)], "p long")
    quant = (
        ranked.crossJoin(F.broadcast(pcts))
        .where(
            F.col("asc_rank")
            == F.greatest(
                F.lit(1),
                F.ceil(F.col("nk") * F.col("p") / F.lit(100.0)).cast("long"),
            )
        )
        .select(
            F.concat(F.lit("p"), F.col("p")).alias("kind"),
            F.col("p").alias("rank"),
            "key",
            "n",
        )
    )
    return hot.unionByName(quant).orderBy("kind", "rank")
