"""Phase-A smoke: entry() runs end-to-end and SQL/DataFrame paths agree."""

from __future__ import annotations

import __spark_entry__ as entrymod
from ushas_spark.io import register_views


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_sql_and_dataframe_agree(spark, sf_dir):
    """Same query via spark.sql and the DataFrame API must match
    (SURVEY.md section 5: cross-checking strategy)."""
    register_views(spark, sf_dir)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    from pyspark.sql import functions as F

    df_rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert sql_rows == df_rows
