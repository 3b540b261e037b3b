"""Lineage surfaced through the correctness gate.

The lineage engine is driver-side plan metadata, but its OUTPUT is plain
data -- so we pin it in the oracle harness: run a fixed query shape,
extract its provenance edges, and compare against the literal edge list
(the lineage equivalent of a golden file, cross-checked by DuckDB's
VALUES). This is stronger than the reference's test story, which has zero
automated lineage tests (SURVEY.md section 5 item 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.lineage import lineage
from ushas_spark.registry import query

_EDGE_ORACLE = """
SELECT * FROM (VALUES
  ('avg_price', 'orders',   'o_totalprice'),
  ('n_cust',    'customer', 'c_custkey'),
  ('n_name',    'nation',   'n_name'),
  ('revenue',   'orders',   'o_totalprice')
) AS t(out_col, source, src_col)
ORDER BY out_col, source, src_col
"""


@query("lineage_edges_join_agg", oracle=_EDGE_ORACLE)
def lineage_edges_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance edges of a join+aggregate query: every output column
    traces to exactly the base-table columns it derives from -- including
    THROUGH the joins (which are pass-through in the reference; our
    Aggregate extension keeps per-column precision)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    df = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice") * 0.9).alias("revenue"),
            F.avg("o_totalprice").alias("avg_price"),
            F.countDistinct("c_custkey").alias("n_cust"),
        )
    )
    edges = lineage(df).edges()
    return spark.createDataFrame(
        sorted(edges), schema="out_col string, source string, src_col string"
    ).orderBy("out_col", "source", "src_col")
