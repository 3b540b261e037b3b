"""Bit-equality twin for the r12 Arrow PCA moment pass.

sim_pca_power_iteration's corpus pass is a reviewed Arrow allowance
(tests/test_plan_lint.py PANDAS_EVAL_OK_NAMES): one mapInPandas pass
emits exact-integer partial moments instead of the JVM explode's three
corpus scans. Every readout is an order-independent integer sum, so
the Arrow main path must reproduce the JVM shape bit-for-bit -- the
JVM shape is the formulation the DuckDB oracle certified.
"""

from ushas_spark.operators.clustering import (
    _pca_jvm_power_iteration,
    sim_pca_power_iteration,
)


def test_arrow_main_path_matches_jvm_explode(spark, sf_dir):
    arrow = [tuple(r) for r in sim_pca_power_iteration(spark, sf_dir).collect()]
    jvm = [tuple(r) for r in _pca_jvm_power_iteration(spark, sf_dir).collect()]
    assert arrow == jvm


def test_arrow_moment_pass_is_single_corpus_scan(spark, sf_dir):
    """The materialized moment aggregate must feed all four downstream
    readouts (cells x2, means, count) from ONE corpus pass: the final
    plan may contain no embeddings parquet scan (only InMemoryTableScan
    over the truncated segments) and no BatchEvalPython (the boundary
    is Arrow-vectorized)."""
    plan = (
        sim_pca_power_iteration(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "embeddings" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
