"""Hilbert conversion: canonical-algorithm equivalence + curve properties."""
from __future__ import annotations

import random

import pyspark.sql.functions as F

from ushas_spark.operators.layout import _H_BITS, _H_N, _hilbert_steps


def _xy2d_wiki(n: int, x: int, y: int) -> int:
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _spark_hilbert(spark, pts):
    df = spark.createDataFrame(pts, "hx bigint, hy bigint").select(
        "hx", "hy", F.lit(0).cast("long").alias("hd"),
        F.col("hx").alias("nx"), F.col("hy").alias("ny"),
    )
    out = _hilbert_steps(df, list(range(_H_BITS - 1, -1, -1)))
    return {(r.nx, r.ny): r.hd for r in out.collect()}


def test_hilbert_matches_canonical_algorithm(spark):
    rng = random.Random(11)
    pts = [(rng.randrange(_H_N), rng.randrange(_H_N)) for _ in range(300)]
    got = _spark_hilbert(spark, pts)
    for x, y in pts:
        assert got[(x, y)] == _xy2d_wiki(_H_N, x, y)


def test_hilbert_bijection_and_adjacency_on_subgrid(spark):
    # Every consecutive pair of indices on a full subgrid must be grid
    # neighbours (the no-seam property Z-order lacks). Scale the 4-bit
    # grid's coords into the full 16-bit domain? No -- adjacency holds
    # per full-resolution cells, so test the exact corner 16x16 cells.
    pts = [(x, y) for x in range(16) for y in range(16)]
    got = _spark_hilbert(spark, pts)
    # The low-order 16x16 corner of the 65536-grid is traversed by one
    # contiguous d-range only in curve-aligned blocks; instead assert
    # bijection + that sorting by d yields unit steps within the block
    # whenever consecutive d values are both in the block.
    assert len(set(got.values())) == 256
    by_d = sorted((d, xy) for xy, d in got.items())
    for (d1, (x1, y1)), (d2, (x2, y2)) in zip(by_d, by_d[1:]):
        if d2 == d1 + 1:
            assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_arrow_main_path_matches_jvm_chain(spark, sf_dir):
    """The r11 Arrow pandas_udf main path must reproduce the JVM
    expression chain's histogram bit-for-bit (the chain is itself
    pinned to the canonical Wikipedia algorithm above)."""
    from ushas_spark.operators.layout import (
        _hilbert_chain_histogram,
        layout_hilbert_histogram,
    )

    arrow = [tuple(r) for r in layout_hilbert_histogram(spark, sf_dir).collect()]
    chain = [tuple(r) for r in _hilbert_chain_histogram(spark, sf_dir).collect()]
    assert arrow == chain
