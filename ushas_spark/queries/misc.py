"""Remaining function-surface coverage (SURVEY.md section 2.8 misc rows):
bitwise/conditional aggregates, from_csv, try_ arithmetic, median, script
transform, XML xpath, and URL functions.

xpath/URL families have no DuckDB twin -> rows-only + golden unit tests
(tests/test_spark_only.py). Script transform (reference:
ScriptTransformation.scala / hive ScriptTransformationExec.scala:55) runs
without Hive in Spark 3+ and pipes rows through an external process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table, register_views
from ushas_spark.registry import query


@query(
    "agg_bitwise_conditional",
    oracle="""
SELECT l_returnflag,
       bit_and(l_linenumber) AS band,
       bit_or(l_linenumber) AS bor,
       bit_xor(l_linenumber) AS bxor,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
       bool_or(l_discount > 0.09) AS any_high_disc,
       bool_and(l_quantity >= 1) AS all_qty_pos
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_bitwise_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate functions + count_if/bool_or/bool_and
    (reference: catalyst bitwiseAggregates / UnevaluableAggs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").cast("long").alias("band"),
            F.bit_or("l_linenumber").cast("long").alias("bor"),
            F.bit_xor("l_linenumber").cast("long").alias("bxor"),
            F.count_if(F.col("l_quantity") > 25).alias("n_big"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_high_disc"),
            F.bool_and(F.col("l_quantity") >= 1).alias("all_qty_pos"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "expr_from_csv",
    oracle="""
WITH t AS (
  SELECT doc_id,
         concat(lang, ',', CAST(n_chars AS VARCHAR), ',', source) AS line
  FROM documents
)
SELECT doc_id,
       split_part(line, ',', 1) AS lang_parsed,
       CAST(split_part(line, ',', 2) AS BIGINT) AS chars_parsed,
       split_part(line, ',', 3) AS source_parsed
FROM t
ORDER BY doc_id
""",
)
def expr_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_csv: schema-typed parse of delimited string columns
    (reference: csvExpressions CsvToStructs). Oracle parses the same
    lines positionally."""
    d = load_table(spark, sf_dir, "documents")
    line = F.concat_ws(",", "lang", F.col("n_chars").cast("string"), "source")
    parsed = F.from_csv(line, "lang string, n bigint, src string")
    return d.select(
        "doc_id",
        parsed.getField("lang").alias("lang_parsed"),
        parsed.getField("n").alias("chars_parsed"),
        parsed.getField("src").alias("source_parsed"),
    ).orderBy("doc_id")


@query(
    "expr_try_arithmetic",
    oracle="""
SELECT p_partkey,
       p_size + 1 AS t_add,
       p_size * 3 AS t_mul,
       p_retailprice / nullif(CAST(p_size - p_size AS DOUBLE), 0.0) AS div_by_zero,
       p_retailprice / nullif(CAST(p_size AS DOUBLE), 0.0) AS t_div
FROM part
ORDER BY p_partkey
""",
)
def expr_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_add/try_multiply/try_divide: NULL instead of ANSI error
    (Spark 4 runs ANSI mode by default, matching DuckDB's strictness;
    the oracle emulates with nullif guards)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.try_add(F.col("p_size"), F.lit(1)).cast("long").alias("t_add"),
        F.try_multiply(F.col("p_size"), F.lit(3)).cast("long").alias("t_mul"),
        F.try_divide(F.col("p_retailprice"), (F.col("p_size") - F.col("p_size")).cast("double")).alias("div_by_zero"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size").cast("double")).alias("t_div"),
    ).orderBy("p_partkey")


@query(
    "agg_median",
    oracle="""
SELECT o_orderstatus,
       median(o_totalprice) AS med,
       quantile_cont(o_totalprice, 0.9) AS p90
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median == interpolated 50th percentile in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.median("o_totalprice").alias("med"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        )
        .orderBy("o_orderstatus")
    )


_TRANSFORM_SQL = """
SELECT TRANSFORM (n_nationkey, n_name)
  USING 'cat'
  AS (k string, name string)
FROM nation
"""


@query(
    "script_transform_cat",
    oracle="""
SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS name
FROM nation
ORDER BY CAST(k AS INTEGER)
""",
)
def script_transform_cat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TRANSFORM ... USING (script transform; reference:
    plans/logical/ScriptTransformation.scala): rows piped tab-separated
    through an external process ('cat' == identity). Spark 3+ supports
    this without Hive. At scale each task pipes its partition through its
    own process -- fully distributed."""
    register_views(spark, sf_dir)
    return spark.sql(_TRANSFORM_SQL).orderBy(F.col("k").cast("int"))


@query("expr_xpath_url_battery")  # no DuckDB twin: rows-only + golden tests
def expr_xpath_url_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML xpath family (reference: expressions/xml/) and URL functions
    -- Spark-only surface, pinned by golden values in
    tests/test_spark_only.py.

    Output is ATOMIC-ONLY by contract: the driver's rows-only
    canonicalizer (pandas sort + factorize) crashes on top-level
    array/map columns (r09 evidence row: TypeError unhashable 'list'
    on the raw ``xpath()`` array), so the multi-node xpath() result is
    serialized via array_join -- same rule the plan-wide schema lint
    (tests/test_plan_lint.py) now enforces for every registered query."""
    d = load_table(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<doc><id>"),
        F.col("doc_id").cast("string"),
        F.lit("</id><lang>"),
        F.col("lang"),
        F.lit("</lang></doc>"),
    )
    url = F.concat(
        F.lit("https://corpus.example/"),
        F.col("source"),
        F.lit("/fetch?id="),
        F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        F.xpath_string(xml, F.lit("//lang")).alias("xp_lang"),
        F.xpath_long(xml, F.lit("//id")).alias("xp_id"),
        F.array_join(F.xpath(xml, F.lit("//doc/*/text()")), "|").alias(
            "xp_all"
        ),
        F.parse_url(url, F.lit("HOST")).alias("u_host"),
        F.parse_url(url, F.lit("PATH")).alias("u_path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("u_qid"),
        F.url_encode(F.col("text").substr(1, 20)).alias("u_enc"),
    ).orderBy("doc_id")
