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


def test_arrow_moment_pass_overflow_guard_fails_loudly():
    """r13 (VERDICT r12 item 7): numpy int64 wraps where ANSI throws.
    A synthetic over-budget frame (one row whose |x| makes n*max^2
    cross 2^63) must raise, not return wrapped numbers. Exercised on
    the module-level generator directly: a deliberately-crashed Spark
    task kills the session's reused Python workers and flakes the NEXT
    test's job (observed ClosedSelectorException in the full suite)."""
    import pandas as pd
    import pytest
    from ushas_spark.operators.clustering import PCA_DIM, _pca_moment_batches

    over = pd.DataFrame({"xs": [[3_100_000_000] * PCA_DIM]})
    with pytest.raises(OverflowError, match="PCA moment accumulation"):
        list(_pca_moment_batches(iter([over])))


def test_arrow_moment_pass_guard_passes_in_budget():
    """The guard must not fire inside the documented budget: a tiny
    legitimate frame still yields exact partial moments."""
    import pandas as pd
    from ushas_spark.operators.clustering import PCA_DIM, _pca_moment_batches

    rows = pd.DataFrame({"xs": [[7] * PCA_DIM, [-3] * PCA_DIM]})
    (out,) = list(_pca_moment_batches(iter([rows])))
    cells = {(r.i, r.j): r.p for r in out.itertuples()}
    assert cells[(-1, -1)] == 2                      # row count
    assert cells[(0, -1)] == 4 and cells[(PCA_DIM - 1, -1)] == 4  # sums
    assert cells[(0, 0)] == 49 + 9                   # diagonal moment
    assert cells[(0, 1)] == 49 + 9                   # off-diagonal
