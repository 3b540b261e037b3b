"""UDF / UDAF / grouped-map surface (SURVEY.md section 2.10).

Reference rows -> PySpark mappings exercised here, each with a DuckDB
oracle where the logic is SQL-expressible (the UDF bodies are chosen to
be deterministic and portable so the oracle can mirror them):

- Python UDF (reference: expressions/PythonUDF.scala:50, BatchEval
  PythonExec) -- row-at-a-time; registered for SQL via
  spark.udf.register. THE SLOW PATH: fine for glue, never for hot loops.
- Arrow-optimized scalar pandas UDF (ArrowEvalPythonExec) -- the
  vectorized Python boundary.
- grouped-agg pandas UDF (AggregateInPandasExec) -- UDAF surface
  (reference: expressions/udaf.scala:32).
- applyInPandas grouped map (FlatMapGroupsInPandasExec) + cogrouped map
  (reference: plans/logical/object.scala MapGroups:347 / CoGroup:510).
- array-returning UDF + explode == UDTF (reference: generators.scala
  UserDefinedGenerator:91).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ushas_spark.io import load_table
from ushas_spark.registry import query


@query(
    "udf_python_row",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'platinum'
            WHEN o_totalprice >= 150000 THEN 'gold'
            ELSE 'standard' END AS tier,
       length(o_orderpriority) * 2 AS prio_len2
FROM orders
ORDER BY o_orderkey
""",
)
def udf_python_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDFs (pickled batches through BatchEvalPython;
    the plan shows a BatchEvalPython/ArrowEvalPython node extracted by
    ExtractPythonUDFs -- reference: python/ExtractPythonUDFs.scala:95)."""

    @F.udf(T.StringType())
    def tier(price: float) -> str:
        if price >= 300000:
            return "platinum"
        if price >= 150000:
            return "gold"
        return "standard"

    @F.udf(T.LongType())
    def prio_len2(p: str) -> int:
        return len(p) * 2

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        tier("o_totalprice").alias("tier"),
        prio_len2("o_orderpriority").alias("prio_len2"),
    ).orderBy("o_orderkey")


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * 1.1 AS marked_up
FROM lineitem
WHERE l_linenumber = 1
ORDER BY l_orderkey, l_linenumber, marked_up
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches; reference:
    ArrowEvalPythonExec). Per-row IEEE arithmetic in numpy matches the
    engines bit-for-bit, so the oracle can mirror the formula."""

    @F.pandas_udf(T.DoubleType())
    def markup(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc) * 1.1

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        markup("l_extendedprice", "l_discount").alias("marked_up"),
    ).orderBy("l_orderkey", "l_linenumber", "marked_up")


@query(
    "udf_pandas_grouped_agg",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / COUNT(*) AS mean_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF == the UDAF surface (reference:
    udaf.scala:32; planned by AggregateInPandasExec). The body uses the
    scaled-integer mean so the result is order-independent and matches
    the oracle exactly."""

    @F.pandas_udf(T.DoubleType())
    def exact_mean(price: pd.Series) -> float:
        scaled = (price * 100).round().astype("int64")
        return float(scaled.sum()) / 100.0 / len(price)

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(exact_mean("o_totalprice").alias("mean_price"))
        .orderBy("o_orderstatus")
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice)
            AS BIGINT) AS price_rank
FROM orders
ORDER BY o_orderkey
""",
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (reference: MapGroups/FlatMapGroupsIn
    PandasExec): one pandas DataFrame per group in, one out. The per-group
    rank('min') mirrors SQL RANK() so the oracle is exact. At scale the
    group key shuffles once and groups must fit in executor memory --
    same constraint as the reference's MapGroups."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["price_rank"] = (
            pdf["o_totalprice"].rank(method="min").astype("int64")
        )
        return pdf[["o_orderkey", "o_custkey", "price_rank"]]

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return (
        o.groupBy("o_custkey")
        .applyInPandas(
            rank_group, schema="o_orderkey long, o_custkey long, price_rank long"
        )
        .orderBy("o_orderkey")
    )


@query(
    "udf_cogroup_apply",
    oracle="""
SELECT c.c_custkey,
       COALESCE(o.n_orders, 0) AS n_orders,
       c.c_acctbal
FROM customer c
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
  ON c.c_custkey = o.o_custkey
ORDER BY c.c_custkey
""",
)
def udf_cogroup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped map (reference: plans/logical/object.scala CoGroup:510;
    PySpark cogroup().applyInPandas): both sides grouped on the key, the
    function sees the two group frames together -- the escape hatch for
    custom join-like logic (here: a left count-join, so the oracle is
    plain SQL)."""

    def count_orders(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty:
            return pd.DataFrame(columns=["c_custkey", "n_orders", "c_acctbal"])
        return pd.DataFrame(
            {
                "c_custkey": cust["c_custkey"].iloc[:1],
                "n_orders": [len(orders)],
                "c_acctbal": cust["c_acctbal"].iloc[:1],
            }
        )

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            count_orders, schema="c_custkey long, n_orders long, c_acctbal double"
        )
        .orderBy("c_custkey")
    )


@query(
    "udf_udtf_style_explode",
    oracle="""
SELECT doc_id, unnest(regexp_split_to_array(lang || ':' || source, ':')) AS tag
FROM documents
WHERE doc_id < 50
ORDER BY doc_id, tag
""",
)
def udf_udtf_style_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF pattern: array-returning Python UDF + explode (reference:
    UserDefinedGenerator generators.scala:91; modern PySpark also offers
    @udtf classes -- same plan shape, Generate over a Python eval)."""

    @F.udf(T.ArrayType(T.StringType()))
    def tags(lang: str, source: str) -> list[str]:
        return f"{lang}:{source}".split(":")

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select("doc_id", F.explode(tags("lang", "source")).alias("tag"))
        .orderBy("doc_id", "tag")
    )


@query(
    "udf_sql_registered",
    oracle="""
SELECT p_partkey, (p_size * p_size + 1) AS szsq
FROM part
ORDER BY p_partkey
""",
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registered for SQL (reference: UDFRegistration): callable from
    spark.sql text like any builtin."""
    spark.udf.register(
        "ushas_szsq", lambda s: s * s + 1, T.LongType()
    )
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        "SELECT p_partkey, ushas_szsq(p_size) AS szsq FROM part ORDER BY p_partkey"
    )


_UDTF_ORACLE = """
WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
           FROM documents WHERE doc_id < 5)
SELECT doc_id,
       unnest(toks) AS tok,
       unnest(range(0, len(toks))) AS pos
FROM t
ORDER BY doc_id, pos
"""


@query("udf_python_udtf", oracle=_UDTF_ORACLE)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Python UDTF (Spark 3.5+ @udtf, reference parity:
    UserDefinedGenerator generators.scala:91 / Hive GenericUDTF): a
    table function lateral-joined per input row, yielding (token, pos)
    rows. Arrow-batched eval; the generator runs in Python, so this is
    the API-coverage path -- the hot-path equivalent is posexplode(split)
    (see posexplode_with_position), which stays JVM-side."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(re.split(r"\s+", text)):
                yield t, i

    spark.udtf.register("ushas_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok, t.pos
        FROM documents d, LATERAL ushas_tokenize(d.text) t
        WHERE d.doc_id < 5
        ORDER BY d.doc_id, t.pos
        """
    )


_UDTF_ANALYZE_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS s
  FROM documents WHERE doc_id < 5
)
SELECT doc_id,
       CAST(i.i AS INT) - 1 AS pos,
       s[i.i] AS g1,
       s[i.i + 1] AS g2
FROM t, LATERAL (SELECT unnest(CASE WHEN len(s) >= 2
                               THEN generate_series(1, len(s) - 1)
                               ELSE [] END) AS i) i
ORDER BY doc_id, pos
"""


@query("udf_python_udtf_analyze", oracle=_UDTF_ANALYZE_ORACLE)
def udf_python_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()`): the output schema
    is computed at ANALYSIS time from a constant argument -- here
    ngram width n produces columns g1..gn -- the dynamic-schema table
    function the fixed `returnType` UDTF (udf_python_udtf) cannot
    express. The reference's generator surface has no analog; this is
    a deliberate engine upgrade. Called with n=2; the oracle states
    the bigram expansion in plain SQL."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            assert isinstance(n.value, int) and n.value >= 1
            fields = [T.StructField("pos", T.IntegerType())]
            fields += [
                T.StructField(f"g{i + 1}", T.StringType())
                for i in range(n.value)
            ]
            return AnalyzeResult(schema=T.StructType(fields))

        def eval(self, text: str, n: int):
            toks = [t for t in __import__("re").split(r"\s+", text)]
            for i in range(len(toks) - n + 1):
                yield (i, *toks[i : i + n])

    spark.udtf.register("ushas_ngrams", udtf(NGrams))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.g1, t.g2
        FROM documents d, LATERAL ushas_ngrams(d.text, 2) t
        WHERE d.doc_id < 5
        ORDER BY d.doc_id, t.pos
        """
    )


_ARROW_UDF_ORACLE = """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_x100,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) % 97 AS price_mod97
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_orderkey
"""


@query("udf_arrow_scalar", oracle=_ARROW_UDF_ORACLE)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-NATIVE scalar UDF (Spark 4.1 @arrow_udf): the function
    receives and returns pyarrow.Array -- zero pandas conversion, the
    lowest-overhead Python boundary Spark offers, one tier below the
    pandas UDF (udf_pandas_scalar). Exact integer arithmetic via
    pyarrow.compute, so the oracle gates bit-for-bit."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql.functions import ArrowUDFType, arrow_udf

    # functionType passed explicitly: this module uses postponed
    # annotation evaluation, which stringifies the pa.Array hints the
    # decorator would otherwise introspect.
    @arrow_udf("bigint", ArrowUDFType.SCALAR)
    def price_x100(v):
        return pc.cast(pc.round(pc.multiply(v, 100.0)), pa.int64())

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return (
        o.select(
            "o_orderkey", price_x100(F.col("o_totalprice")).alias("price_x100")
        )
        .withColumn("price_mod97", F.col("price_x100") % 97)
        .orderBy("o_orderkey")
    )
