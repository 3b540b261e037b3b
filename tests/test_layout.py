"""Z-order layout: correctness of the curve + the actual pruning win.

The pruning test writes the same data twice -- sorted on one key vs
Z-ordered on two -- and inspects real parquet row-group min/max
statistics with pyarrow: for a 2-D box predicate, the Z-ordered layout
must leave strictly fewer row groups un-prunable than the single-key
sort. That is the property a 100 TB table relies on; no Spark metrics
mocking involved.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ushas_spark.operators.layout import zorder_by, zvalue


def _interleave_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", zvalue(F.col("x"), F.col("y")).alias("z")
    )
    for x, y, z in df.collect():
        assert z == _interleave_ref(x, y), (x, y)


def test_zvalue_preserves_2d_locality(spark):
    # Morton property: a box [x0,x0+d) x [y0,y0+d) maps into a z-range
    # no wider than ~4*d^2 for power-of-two-aligned boxes.
    df = spark.range(0, 64).selectExpr("id % 8 AS x", "id div 8 AS y")
    z = df.select(zvalue(F.col("x"), F.col("y")).alias("z"))
    got = sorted(r.z for r in z.collect())
    assert got == list(range(64))  # 8x8 aligned box covers exactly [0, 64)


def _rowgroups_overlapping(path_glob: str, col_a: str, lo_a, hi_a, col_b, lo_b, hi_b):
    """Count (overlapping, total) row groups for the 2-D box predicate
    using real parquet footer statistics -- what a scan's row-group
    filter would keep."""
    overlap = total = 0
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            sa = meta.row_group(rg).column(idx[col_a]).statistics
            sb = meta.row_group(rg).column(idx[col_b]).statistics
            if sa.min <= hi_a and sa.max >= lo_a and sb.min <= hi_b and sb.max >= lo_b:
                overlap += 1
    return overlap, total


def test_zorder_prunes_more_rowgroups_than_single_key_sort(spark, tmp_path):
    # sf0.01 regardless of the suite SF: the test needs enough rows for
    # multiple row groups per file.
    li = (
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity")
    )
    single = str(tmp_path / "single")
    zord = str(tmp_path / "zorder")
    opts = {"parquet.block.size": str(64 * 1024)}  # small row groups
    (
        li.repartitionByRange(4, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.options(**opts)
        .parquet(single)
    )
    zorder_by(li, "l_partkey", "l_orderkey").write.options(**opts).parquet(zord)

    def frac(path, col, lo, hi):
        # One-dimensional range predicate; the other dimension unbounded.
        other = "l_orderkey" if col == "l_partkey" else "l_partkey"
        ov, tot = _rowgroups_overlapping(
            path + "/*.parquet", col, lo, hi, other, -(2**31), 2**31
        )
        assert tot >= 8, f"{path}: need multiple row groups, got {tot}"
        return ov / tot

    # Sort key (orderkey) predicate: both layouts prune.
    s_ok = frac(single, "l_orderkey", 1000, 3000)
    z_ok = frac(zord, "l_orderkey", 1000, 3000)
    # Non-sort-key (partkey) predicate: the single-key layout reads
    # everything; the z-ordered layout still prunes.
    s_pk = frac(single, "l_partkey", 100, 140)
    z_pk = frac(zord, "l_partkey", 100, 140)
    assert s_pk > 0.9, f"single layout unexpectedly pruned partkey: {s_pk}"
    assert z_pk < 0.6, f"zorder failed to prune on partkey: {z_pk}"
    assert z_ok < 0.9, f"zorder lost all orderkey locality: {z_ok}"
    # The two-dimensional win: worst-case single-dimension fraction.
    assert max(z_ok, z_pk) < max(s_ok, s_pk), (
        f"zorder ok={z_ok} pk={z_pk} vs single ok={s_ok} pk={s_pk}"
    )


def test_compact_small_files(spark, tmp_path):
    """64 tiny files compact into the size-targeted count with no row
    loss."""
    from ushas_spark.operators.layout import compact_files

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.repartition(64).write.parquet(src)
    n_src = len(glob.glob(src + "/*.parquet"))
    assert n_src == 64
    total = sum(
        os.path.getsize(f) for f in glob.glob(src + "/*.parquet")
    )
    target = total // 4  # aim for ~4-5 files
    n = compact_files(spark, src, dst, target_bytes=target)
    n_dst = len(glob.glob(dst + "/*.parquet"))
    assert n_dst == n <= 6
    assert spark.read.parquet(dst).count() == li.count()
