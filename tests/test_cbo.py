"""Cost-based-optimizer surface: ANALYZE TABLE statistics + estimation.

The reference ships CostBasedJoinReorder gated on table/column stats
(reference: sql/catalyst/src/main/scala/org/apache/spark/sql/catalyst/
optimizer/CostBasedJoinReorder.scala:35, SQLConf CBO_ENABLED) and
collects those stats via ANALYZE TABLE. These tests pin that the same
surface works here: stats land in the catalog, flow into logical-plan
estimation, and filters shrink the estimate (the signal join reorder
consumes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stats_table(spark, sf_dir):
    name = "cbo_orders"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.read.parquet(f"{sf_dir}/orders.parquet").write.saveAsTable(name)
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_analyze_table_populates_catalog_stats(spark, stats_table):
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {stats_table}").collect()
    }
    stats_line = desc.get("Statistics", "")
    assert "rows" in stats_line, desc
    n = spark.table(stats_table).count()
    assert f"{n} rows" in stats_line, stats_line


def test_analyze_column_stats_visible(spark, stats_table):
    rows = spark.sql(
        f"DESCRIBE EXTENDED {stats_table} o_totalprice"
    ).collect()
    info = {r.info_name: r.info_value for r in rows}
    assert info.get("distinct_count") not in (None, "NULL"), info
    assert info.get("min") not in (None, "NULL"), info
    assert info.get("max") not in (None, "NULL"), info


def test_plan_stats_estimate_shrinks_under_filter(spark, stats_table):
    """With CBO on, the optimizer's row estimate for a selective filter
    must be well below the table row count (this estimate is exactly
    what CostBasedJoinReorder ranks join orders with)."""
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        total = spark.table(stats_table).count()
        df = spark.table(stats_table).filter(F.col("o_totalprice") > 400000)
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        est = stats.rowCount()
        assert est.isDefined(), "CBO produced no row-count estimate"
        val = int(str(est.get()))
        assert 0 < val < total * 0.9, (val, total)
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")


def test_join_cardinality_estimated_with_cbo(spark, stats_table, sf_dir):
    """Join estimates propagate from column stats (ndv): the estimated
    join output is finite and in the right magnitude, not the cartesian
    fallback."""
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        o = spark.table(stats_table)
        j = o.alias("a").join(
            o.alias("b"), F.col("a.o_custkey") == F.col("b.o_custkey")
        )
        stats = j._jdf.queryExecution().optimizedPlan().stats()
        est = stats.rowCount()
        assert est.isDefined()
        n = o.count()
        val = int(str(est.get()))
        assert n <= val < n * n, (val, n)  # keyed estimate, not cartesian
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
