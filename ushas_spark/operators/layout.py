"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

At 100 TB the cheapest query is the one that never reads the file: a
table sorted on ONE key prunes row groups only for predicates on that
key, while sorting by the interleaved bits of TWO keys (the Morton /
Z-order curve) keeps both dimensions locally clustered, so a 2-D box
predicate overlaps a small fraction of row groups (the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``). This module implements the curve
as pure JVM bit arithmetic — shiftleft/AND/OR inside whole-stage
codegen, no UDF — plus a writer helper; the pruning win is demonstrated
with real parquet row-group statistics in
``tests/test_layout.py``.

The bit-spread is the classic magic-number interleave (public domain,
e.g. "Bit Twiddling Hacks"): 16-bit x,y -> 32-bit z with
x-bits in even positions. Everything is BIGINT so the DuckDB oracle
mirrors the exact expression tree. Reference analog: the fork has no
layout optimizer — files are written in insert order
(sql/core/src/main/scala/org/apache/spark/sql/execution/datasources/
FileFormatWriter.scala); Z-ordering is the extension a 100 TB
deployment adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query

_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _part1by1(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` into the even bit positions."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _sql_part1by1(expr: str) -> str:
    x = f"({expr} & 65535)"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zvalue(x: Column, y: Column) -> Column:
    """Morton code: interleave(x even bits, y odd bits), 32-bit range."""
    return _part1by1(x).bitwiseOR(F.shiftleft(_part1by1(y), 1))


def sql_zvalue(x: str, y: str) -> str:
    return f"({_sql_part1by1(x)} | ({_sql_part1by1(y)} << 1))"


def _normalized(col: Column, lo: Column, hi: Column) -> Column:
    """Scale ``col`` linearly into the full 16-bit range.

    Interleaving RAW values is the classic Z-order mistake: if one key
    uses 16 bits and the other 11, the top interleaved bits are
    constant-zero for the narrow key and the curve degenerates to a
    single-key sort (measured: zero partkey pruning on lineitem before
    this fix). Production optimizers normalize per column first —
    Delta/Iceberg use range-partition ranks; a min/max linear map is the
    shuffle-free equivalent (one broadcast 1-row aggregate) and is what
    we use, with the usual caveat that heavy skew wants rank-based
    scaling instead.
    """
    denom = F.greatest(hi - lo, F.lit(1)).cast("double")
    return F.floor((col - lo).cast("double") * F.lit(65535.0) / denom).cast("long")


def zorder_by(df: DataFrame, x: str, y: str) -> DataFrame:
    """Range-repartition + sort ``df`` along the Z-curve of (x, y).

    Both dimensions are min/max-normalized to 16 bits (see
    :func:`_normalized`), then ``repartitionByRange`` on the z-value
    gives each output file a disjoint z-range (globally sorted layout),
    which is what turns row-group min/max stats into 2-D pruning.
    Writer-side usage::

        zorder_by(df, "l_partkey", "l_orderkey").write.parquet(path)
    """
    stats = df.agg(
        F.min(x).alias("__xlo"),
        F.max(x).alias("__xhi"),
        F.min(y).alias("__ylo"),
        F.max(y).alias("__yhi"),
    )
    z = zvalue(
        _normalized(F.col(x), F.col("__xlo"), F.col("__xhi")),
        _normalized(F.col(y), F.col("__ylo"), F.col("__yhi")),
    ).alias("__z")
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", z)
        .repartitionByRange("__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__xlo", "__xhi", "__ylo", "__yhi")
    )


# Gate query: the z-curve histogram of lineitem over normalized
# (partkey, orderkey). 4096 coarse buckets (top 12 of 32 bits);
# per-bucket counts and z extrema pin every bit of the normalize +
# interleave pipeline on both engines.
_Z_X = "l_partkey"
_Z_Y = "l_orderkey"


def _sql_norm(col: str, lo: str, hi: str) -> str:
    return (
        f"CAST(FLOOR(CAST({col} - {lo} AS DOUBLE) * 65535.0"
        f" / CAST(GREATEST({hi} - {lo}, 1) AS DOUBLE)) AS BIGINT)"
    )


_Z_ORACLE = f"""
WITH stats AS (
  SELECT MIN({_Z_X}) AS xlo, MAX({_Z_X}) AS xhi,
         MIN({_Z_Y}) AS ylo, MAX({_Z_Y}) AS yhi
  FROM lineitem),
z AS (
  SELECT {sql_zvalue(_sql_norm(_Z_X, "xlo", "xhi"),
                     _sql_norm(_Z_Y, "ylo", "yhi"))} AS zval
  FROM lineitem, stats)
SELECT zval >> 20 AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(zval) AS BIGINT) AS z_min,
       CAST(MAX(zval) AS BIGINT) AS z_max
FROM z GROUP BY z_bucket ORDER BY z_bucket
"""


@query("layout_zorder_histogram", oracle=_Z_ORACLE)
def layout_zorder_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-curve bucket histogram of lineitem (pins normalize+interleave)."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min(_Z_X).alias("xlo"),
        F.max(_Z_X).alias("xhi"),
        F.min(_Z_Y).alias("ylo"),
        F.max(_Z_Y).alias("yhi"),
    )
    z = zvalue(
        _normalized(F.col(_Z_X), F.col("xlo"), F.col("xhi")),
        _normalized(F.col(_Z_Y), F.col("ylo"), F.col("yhi")),
    ).alias("zval")
    return (
        li.crossJoin(F.broadcast(stats))
        .select(z)
        .groupBy(F.shiftright(F.col("zval"), 20).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
        .orderBy("z_bucket")
    )


def compact_files(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~``target_bytes`` files.

    The small-files fix (Delta OPTIMIZE / Iceberg rewrite_data_files
    analog): size the output file count from the INPUT's on-disk bytes,
    then one round-robin repartition + write. Returns the file count
    used. Metadata-only sizing -- the data itself is read once, written
    once; no collect. Compression ratios carry over because input and
    output are both parquet.

    At 100 TB this is the compaction job run after streaming ingest or
    fine-grained partitioned writes; a sorted/z-ordered layout should
    instead compact with :func:`zorder_by` to preserve clustering
    (round-robin destroys order).
    """
    import os

    total = 0
    for root, _, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // target_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files


# ---------------------------------------------- bitmap shard index
IDX_SHARDS = 16     # files/shards the fact is laid out into
IDX_WORDS = 16      # 63-bit words per shard bitmap -> 1008 bit positions
IDX_BITS = IDX_WORDS * 63
IDX_PROBES = 25     # probe keys: o_custkey < 25

_BITMAP_ORACLE = f"""
WITH base AS (
  SELECT ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
           % {IDX_SHARDS} AS shard,
         ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           % {IDX_BITS} AS p,
         o_custkey
  FROM orders
), words AS (
  SELECT shard, p // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
  FROM base GROUP BY shard, p // 63
), probes AS (
  SELECT DISTINCT o_custkey AS probe_key,
         ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
           % {IDX_BITS} AS p
  FROM orders WHERE o_custkey < {IDX_PROBES}
), cand AS (
  SELECT pr.probe_key, w.shard
  FROM probes pr
  JOIN words w ON w.word = pr.p // 63
              AND (w.bits & (CAST(1 AS BIGINT) << CAST(pr.p % 63 AS INT)))
                  <> 0
), truth AS (
  SELECT DISTINCT b.o_custkey AS probe_key, b.shard
  FROM base b WHERE b.o_custkey < {IDX_PROBES}
)
SELECT p.probe_key,
       CAST((SELECT COUNT(*) FROM cand c
             WHERE c.probe_key = p.probe_key) AS BIGINT) AS n_candidate_shards,
       CAST((SELECT COUNT(*) FROM truth t
             WHERE t.probe_key = p.probe_key) AS BIGINT) AS n_true_shards,
       CAST((SELECT COUNT(*) FROM truth t
             WHERE t.probe_key = p.probe_key
               AND NOT EXISTS (SELECT 1 FROM cand c
                               WHERE c.probe_key = t.probe_key
                                 AND c.shard = t.shard)) AS BIGINT)
         AS n_missed
FROM (SELECT DISTINCT probe_key FROM probes) p
ORDER BY p.probe_key
"""


@query("layout_bitmap_index", oracle=_BITMAP_ORACLE)
def layout_bitmap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping BITMAP INDEX in pure SQL: each of {IDX_SHARDS}
    fact shards summarises its join keys into a {IDX_BITS}-bit
    membership bitmap ({IDX_WORDS} x 63-bit words, bit_or-aggregated
    -- 63 bits per word because a 1<<63 BIGINT shift overflows
    portably), and point-lookup probes consult ONLY the tiny
    (shard, word) bitmap table to decide which shards to read -- the
    same skip-index contract as parquet bloom filters / Z-order
    row-group stats (layout_zorder_histogram), built and probed as
    DataFrames. n_missed must be 0 for every probe: a membership
    bitmap can false-positive (extra candidate shards = wasted reads,
    priced by n_candidate_shards - n_true_shards) but NEVER
    false-negative.

    Scale shape: index build is one scan + a rollup to at most
    |shards| x |words| rows (tiny, broadcastable); each probe is a
    broadcast join against that table -- no fact access at all until
    the chosen shards are read."""
    orders = load_table(spark, sf_dir, "orders")
    from ushas_spark.operators.dedup import hash60

    base = orders.select(
        (hash60(F.col("o_orderkey").cast("string")) % IDX_SHARDS).alias(
            "shard"
        ),
        (hash60(F.col("o_custkey").cast("string")) % IDX_BITS).alias("p"),
        "o_custkey",
    )
    words = base.groupBy(
        "shard", F.expr("p div 63").alias("word")
    ).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT)))")
        .alias("bits")
    )
    probes = (
        orders.filter(F.col("o_custkey") < IDX_PROBES)
        .select(F.col("o_custkey").alias("probe_key"))
        .distinct()
        .withColumn(
            "p", hash60(F.col("probe_key").cast("string")) % IDX_BITS
        )
    )
    cand = probes.join(
        F.broadcast(words),
        (F.col("word") == F.expr("p div 63"))
        & (
            F.expr(
                "(bits & shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT)))"
            )
            != 0
        ),
    ).select("probe_key", "shard")
    truth = (
        base.filter(F.col("o_custkey") < IDX_PROBES)
        .select(F.col("o_custkey").alias("probe_key"), "shard")
        .distinct()
    )
    n_cand = cand.groupBy("probe_key").agg(
        F.count(F.lit(1)).alias("n_candidate_shards")
    )
    n_true = truth.groupBy("probe_key").agg(
        F.count(F.lit(1)).alias("n_true_shards")
    )
    missed = (
        truth.join(cand, ["probe_key", "shard"], "left_anti")
        .groupBy("probe_key")
        .agg(F.count(F.lit(1)).alias("n_missed"))
    )
    return (
        probes.select("probe_key")
        .join(n_cand, "probe_key", "left")
        .join(n_true, "probe_key", "left")
        .join(missed, "probe_key", "left")
        .select(
            "probe_key",
            F.coalesce("n_candidate_shards", F.lit(0)).alias(
                "n_candidate_shards"
            ),
            F.coalesce("n_true_shards", F.lit(0)).alias("n_true_shards"),
            F.coalesce("n_missed", F.lit(0)).alias("n_missed"),
        )
        .orderBy("probe_key")
    )


# ----------------------------------------------------- Hilbert curve layout

_H_BITS = 16
_H_N = 1 << _H_BITS  # 65536 x 65536 grid; d fits 32 bits


def _hilbert_steps(df: DataFrame, bits: list[int]) -> DataFrame:
    """Apply the xy2d rotation steps for the given bit positions.

    BRANCHLESS integer arithmetic (rx/ry as 0/1 ints, the quadrant as
    3*rx + ry - 2*rx*ry) instead of CASE chains, and one projection per
    step: the naive single-expression unroll references each prior
    column ~4x per step, so Catalyst's analysis tree grows 4^steps --
    the first cut simply hung. Even with per-step projections,
    CollapseProject re-inlines everything, so the CALLER must place a
    materialize() barrier between the two 8-step halves (3^8 ~ 6.5k
    nodes per column per half -- trivially analyzable; 3^16 is not).
    Chunk size 4 (not 8): an 8-step chunk's generated code exceeds the
    whole-stage-codegen method limit and the projection silently runs
    INTERPRETED -- measured 12.6s for the histogram at sf0.1, vs ~0.4s
    with 4-step chunks whose methods stay within codegen limits."""
    out = df
    for i in bits:
        sbit = 1 << i
        out = out.select(
            F.expr(f"cast(shiftright(hx, {i}) & 1 as bigint)").alias("rx"),
            F.expr(f"cast(shiftright(hy, {i}) & 1 as bigint)").alias("ry"),
            "hx",
            "hy",
            "hd",
            "nx",
            "ny",
        ).select(
            (
                F.col("hd")
                + (
                    3 * F.col("rx")
                    + F.col("ry")
                    - 2 * F.col("rx") * F.col("ry")
                )
                * F.lit(sbit * sbit).cast("long")
            ).alias("hd"),
            (
                F.col("ry") * F.col("hx")
                + (1 - F.col("ry"))
                * (
                    F.col("rx") * (F.lit(_H_N - 1) - F.col("hy"))
                    + (1 - F.col("rx")) * F.col("hy")
                )
            ).alias("hx"),
            (
                F.col("ry") * F.col("hy")
                + (1 - F.col("ry"))
                * (
                    F.col("rx") * (F.lit(_H_N - 1) - F.col("hx"))
                    + (1 - F.col("rx")) * F.col("hx")
                )
            ).alias("hy"),
            "nx",
            "ny",
        )
    return out


def _sql_hilbert_cte_chain(x0: str, y0: str, src: str) -> str:
    """The identical unrolled steps as chained CTEs (DuckDB mirror).

    The midpoint CTE is AS MATERIALIZED for the same reason the Spark
    side materializes: a purely-inlined 16-step chain multiplies the
    shared subtrees in the binder."""
    parts = [
        f"h0 AS (SELECT {x0} AS hx, {y0} AS hy, CAST(0 AS BIGINT) AS hd,"
        f" {x0} AS nx, {y0} AS ny FROM {src})"
    ]
    for k, i in enumerate(range(_H_BITS - 1, -1, -1)):
        sbit = 1 << i
        rx = f"CAST((hx >> {i}) & 1 AS BIGINT)"
        ry = f"CAST((hy >> {i}) & 1 AS BIGINT)"
        mat = " MATERIALIZED" if k + 1 == _H_BITS // 2 else ""
        parts.append(
            f"h{k + 1} AS{mat} (SELECT"
            f" hd + (3 * {rx} + {ry} - 2 * {rx} * {ry}) * {sbit * sbit} AS hd,"
            f" {ry} * hx + (1 - {ry}) * ({rx} * ({_H_N - 1} - hy)"
            f"   + (1 - {rx}) * hy) AS hx,"
            f" {ry} * hy + (1 - {ry}) * ({rx} * ({_H_N - 1} - hx)"
            f"   + (1 - {rx}) * hx) AS hy,"
            f" nx, ny FROM h{k})"
        )
    return ",\n".join(parts)


_HILBERT_ORACLE = f"""
WITH stats AS (
  SELECT MIN({_Z_X}) AS xlo, MAX({_Z_X}) AS xhi,
         MIN({_Z_Y}) AS ylo, MAX({_Z_Y}) AS yhi
  FROM lineitem),
pts AS (
  SELECT {_sql_norm(_Z_X, "xlo", "xhi")} AS px,
         {_sql_norm(_Z_Y, "ylo", "yhi")} AS py
  FROM lineitem, stats),
{_sql_hilbert_cte_chain("px", "py", "pts")}
SELECT hd >> 20 AS h_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(hd) AS BIGINT) AS h_min,
       CAST(MAX(hd) AS BIGINT) AS h_max,
       CAST(MAX(nx) - MIN(nx) AS BIGINT) AS x_span,
       CAST(MAX(ny) - MIN(ny) AS BIGINT) AS y_span
FROM h{_H_BITS} GROUP BY h_bucket ORDER BY h_bucket
"""


def _hilbert_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized lineitem points on the 2^{_H_BITS} grid (shared by
    the Arrow main path and the JVM-chain twin)."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min(_Z_X).alias("xlo"),
        F.max(_Z_X).alias("xhi"),
        F.min(_Z_Y).alias("ylo"),
        F.max(_Z_Y).alias("yhi"),
    )
    nx = _normalized(F.col(_Z_X), F.col("xlo"), F.col("xhi"))
    ny = _normalized(F.col(_Z_Y), F.col("ylo"), F.col("yhi"))
    return li.crossJoin(F.broadcast(stats)).select(
        nx.alias("hx"),
        ny.alias("hy"),
        F.lit(0).cast("long").alias("hd"),
        nx.alias("nx"),
        ny.alias("ny"),
    )


def _hilbert_bucket_histogram(done: DataFrame) -> DataFrame:
    """The shared bucket rollup over (hd, nx, ny)."""
    return (
        done.groupBy(F.shiftright(F.col("hd"), 20).alias("h_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("hd").alias("h_min"),
            F.max("hd").alias("h_max"),
            (F.max("nx") - F.min("nx")).alias("x_span"),
            (F.max("ny") - F.min("ny")).alias("y_span"),
        )
        .orderBy("h_bucket")
    )


@query("layout_hilbert_histogram", oracle=_HILBERT_ORACLE)
def layout_hilbert_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve bucket histogram of lineitem over the same
    normalized (partkey, orderkey) plane as the Z-order gate query --
    the modern clustering layout (Hilbert has no quadrant seams, so a
    bucket's x_span/y_span stay bounded where the Z-curve's seam
    buckets stretch across the plane; the spans are in the output so
    the locality advantage is measurable, not asserted). The xy2d
    conversion is the public-domain Wikipedia formulation.

    Since r11 the conversion runs as ONE vectorized Arrow pandas_udf
    pass (numpy int64 bit ops, 16 loop iterations over the batch) --
    the measured-and-shipped exception to this engine's JVM-first rule,
    with a reviewed lint allowance (tests/test_plan_lint.py
    PANDAS_EVAL_OK_NAMES). The JVM expression chain genuinely cannot
    express xy2d efficiently: each of the 16 steps references the
    previous step's columns ~4x, so Catalyst needs materialize()
    barriers every 4 steps to keep analysis from going exponential AND
    to stay under the codegen method limit (see _hilbert_steps). Those
    3 barriers write+read the full 5-column corpus -- at 100 TB that is
    6 extra corpus passes of pure I/O that the single Arrow projection
    does not pay. Measured r11 (interleaved isolated sf0.1 pairings,
    hash-identical output at sf0.001/0.01/0.1): Arrow 1.29/1.63 s vs
    JVM chunk-4 chain 4.06/5.31 s vs JVM chunk-6 chain 3.92/4.23 s --
    a ~3.2x win that GROWS with corpus size (the barriers are the
    scaling term). The chain is kept below as the equivalence twin
    (_hilbert_chain_histogram), bit-equality pinned in
    tests/test_layout_hilbert.py (test_arrow_main_path_matches_jvm_chain).

    Scale shape: one broadcast 1-row min/max aggregate for
    normalization, one shuffle-free Arrow projection pass, one
    map-side-combinable histogram groupBy. A writer would
    repartitionByRange on hd exactly like zorder_by."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    # No type hints: layout.py runs under `from __future__ import
    # annotations`, and pandas_udf cannot resolve the stringified
    # "pd.Series" hints against this function's local pandas import.
    # The explicit PandasUDFType-less scalar form with a returnType is
    # the hint-free signature pandas_udf accepts.
    def _xy2d(hx, hy):
        x = hx.to_numpy(dtype=np.int64, copy=True)
        y = hy.to_numpy(dtype=np.int64, copy=True)
        d = np.zeros(len(x), dtype=np.int64)
        one = np.int64(1)
        for i in range(_H_BITS - 1, -1, -1):
            rx = (x >> i) & one
            ry = (y >> i) & one
            d += (3 * rx + ry - 2 * rx * ry) * np.int64(1 << (2 * i))
            # Simultaneous rotation update (both read the OLD x, y) --
            # the same branchless arithmetic as _hilbert_steps.
            nx2 = ry * x + (1 - ry) * (rx * (_H_N - 1 - y) + (1 - rx) * y)
            y = ry * y + (1 - ry) * (rx * (_H_N - 1 - x) + (1 - rx) * x)
            x = nx2
        return pd.Series(d)

    hilbert_d = pandas_udf(_xy2d, LongType())
    pts = _hilbert_pts(spark, sf_dir)
    done = pts.select(hilbert_d("hx", "hy").alias("hd"), "nx", "ny")
    return _hilbert_bucket_histogram(done)


def _hilbert_chain_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-JVM expression-chain twin (shipped r06-r10): 4-step
    codegen'd projection chunks separated by materialize() barriers.
    Kept as the equivalence oracle for the Arrow main path -- and as
    the fallback if a deployment cannot run Python workers."""
    from ushas_spark.durability import materialize

    pts = _hilbert_pts(spark, sf_dir)
    bits = list(range(_H_BITS - 1, -1, -1))
    chunk = 4  # see _hilbert_steps: codegen method limit, not analysis
    done = pts
    for c in range(0, _H_BITS, chunk):
        done = _hilbert_steps(done, bits[c : c + chunk])
        if c + chunk < _H_BITS:
            done = materialize(done)
    return _hilbert_bucket_histogram(done)
