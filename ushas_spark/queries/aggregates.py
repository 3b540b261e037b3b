"""Aggregation coverage (SURVEY.md section 2.4).

Covers the reference's aggregate planning surface -- hash aggregate with
partial/final phases (reference: execution/aggregate/HashAggregateExec.scala
:40, AggUtils.scala), distinct rewrite (optimizer/RewriteDistinctAggregates
.scala:102), grouping sets / rollup / cube via Expand (plans/logical/
basicLogicalOperators.scala:716), pivot (PivotFirst.scala:71), and the
aggregate-function catalogue (catalyst/expressions/aggregate/*).

Float-valued aggregates use the scaled-integer patterns from
ushas_spark.oracle_exact so results are bit-identical across engines and
partitionings -- which also makes them reproducible run-to-run at 100 TB,
where plain double sums are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.oracle_exact import (
    dec_avg,
    dec_stddev_samp,
    dec_sum,
    dec_var_samp,
    sql_dec_avg,
    sql_dec_stddev_samp,
    sql_dec_sum,
    sql_dec_var_samp,
)
from ushas_spark.registry import query


@query(
    "agg_count_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates + a regular one: exercises the
    RewriteDistinctAggregates Expand-based plan (reference: optimizer/
    RewriteDistinctAggregates.scala:102). At scale each distinct column
    adds one Expand replica of the input -- keep the distinct column set
    small on wide facts."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_minmax_argmax",
    oracle="""
SELECT o_orderstatus,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       MIN(o_orderkey) AS first_key,
       arg_max(o_custkey, o_orderkey) AS cust_of_latest_order
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def agg_minmax_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/max_by. max_by keys on the UNIQUE o_orderkey so the result
    is deterministic (max_by with tied keys is engine-arbitrary)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderkey").alias("first_key"),
            F.max_by("o_custkey", "o_orderkey").alias("cust_of_latest_order"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_collect_sorted",
    oracle="""
SELECT r_name,
       to_json(list_sort(list(DISTINCT n_name))) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set (reference: catalyst/expressions/aggregate/collect.scala
    :113 CollectSet, an ObjectHashAggregate-planned TypedImperativeAggregate)
    -- sorted so the set's arbitrary order doesn't break comparison.
    The array result is serialised with to_json on BOTH sides: the
    driver's canonicalizer hashes cells via pandas and dies on raw list
    cells, so complex-typed outputs cross the comparison boundary as
    JSON strings."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.to_json(F.sort_array(F.collect_set("n_name"))).alias("nations"))
        .orderBy("r_name")
    )


@query(
    "agg_percentile_exact",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5)  AS q50,
       quantile_cont(l_quantity, 0.75) AS q75
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (reference: catalyst/expressions/
    aggregate/Percentile.scala:58). l_quantity values are small integers
    stored as doubles, so linear interpolation lands on exact quarter
    steps and both engines agree bitwise. For large-cardinality columns
    prefer approx_percentile (see agg_approx_sketches)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("q50"),
            F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_stats_moments",
    oracle=f"""
SELECT o_orderstatus,
       {sql_dec_avg("o_totalprice", "avg_price")},
       {sql_dec_stddev_samp("o_totalprice", "std_price", scale=2)},
       {sql_dec_var_samp("o_totalprice", "var_price", scale=2)}
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance (reference: CentralMomentAgg.scala:140) computed
    from exact scaled power sums -- order-independent, hence reproducible
    on any partitioning (the engines' own streaming moment updates are
    not)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            dec_avg(F.col("o_totalprice"), "avg_price"),
            dec_stddev_samp(F.col("o_totalprice"), "std_price", scale=2),
            dec_var_samp(F.col("o_totalprice"), "var_price", scale=2),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_rollup",
    oracle="""
SELECT r_name, n_name, COUNT(*) AS n, GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP via Expand (reference: basicLogicalOperators.scala:716
    GroupingSets; analysis ResolveGroupingAnalytics). grouping() flags
    disambiguate real NULL keys from subtotal rows."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n"),
            F.grouping("r_name").cast("long").alias("g_r"),
            F.grouping("n_name").cast("long").alias("g_n"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dec_sum("l_quantity", "sum_qty")},
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations through one Expand."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dec_sum(F.col("l_quantity"), "sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       {sql_dec_sum("o_totalprice", "sum_price", scale=2)},
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL entry point (same analyzed plan
    as the DataFrame path -- SURVEY.md section 3.2)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    f = 100  # scale=2 fixed-point, mirrors sql_dec_sum(scale=2)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(ROUND(o_totalprice * {f}) AS BIGINT)) AS DOUBLE)
                 / {float(f)} AS sum_price,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@query(
    "agg_pivot",
    oracle=f"""
SELECT l_returnflag,
       {sql_dec_sum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", '"O"')},
       {sql_dec_sum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", '"F"')}
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (reference: RelationalGroupedDataset
    .scala:317; PivotFirst.scala:71). Always pass the value list at scale:
    without it Spark runs an extra distinct job over the pivot column."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dec_sum(F.col("l_quantity"), "sum_qty"))
        .orderBy("l_returnflag")
    )


@query("agg_approx_sketches")  # engine-specific estimates: rows-only check
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approx_count_distinct (reference: HyperLogLogPlusPlus
    .scala:52) and approx_percentile (ApproximatePercentile.scala:68).
    Estimates are engine-specific, so no cross-engine oracle -- the test
    suite instead asserts bounded relative error vs exact values."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_having_distinct",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
""",
)
def agg_having_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct -> aggregate rewrite (reference: optimizer/Optimizer.scala
    :1387 ReplaceDistinctWithAggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@query(
    "agg_dedup_keep_first",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM (
  SELECT l_orderkey, l_linenumber, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey, l_suppkey,
                                     l_quantity) AS rn
  FROM lineitem
) WHERE rn = 1
ORDER BY l_orderkey
""",
)
def agg_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key dedup: the reference's Deduplicate operator
    (reference: basicLogicalOperators.scala:971 -> ReplaceDeduplicate-
    WithAggregate) keeps an ARBITRARY row; for a reproducible pipeline we
    pin 'first by explicit order' with a row_number window whose ORDER BY
    is a total order ((orderkey, linenumber) alone is NOT unique in this
    data). Same shuffle cost, deterministic output."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window as W

    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .withColumn("rn", F.row_number().over(w))
        .select("l_orderkey", "l_linenumber", "l_quantity", "rn")
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("l_orderkey")
    )


_HISTOGRAM_ORACLE = f"""
SELECT CAST(LEAST(FLOOR(value / 50.0), 9) AS BIGINT) AS bin,
       COUNT(*) AS n,
       {sql_dec_sum('value', 'bin_value_sum')}
FROM events
GROUP BY 1
ORDER BY bin
"""


@query("agg_histogram_bins", oracle=_HISTOGRAM_ORACLE)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (10 bins of 50 over events.value, last bin
    open-ended): the numeric-profiling primitive. The bin expression is
    per-row IEEE floor division -- bit-portable -- and the per-bin sums
    use exact scaled integers. One map-side-combining aggregation, no
    skew (bins are bounded)."""
    e = load_table(spark, sf_dir, "events")
    bin_col = F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("long")
    return (
        e.groupBy(bin_col.alias("bin"))
        .agg(F.count("*").alias("n"), dec_sum(F.col("value"), "bin_value_sum"))
        .orderBy("bin")
    )


_WEIGHTED_PCT_ORACLE = """
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_x100,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS wt
  FROM lineitem
), per_price AS (
  SELECT flag, price_x100, CAST(SUM(wt) AS BIGINT) AS wsum
  FROM w GROUP BY flag, price_x100
), cum AS (
  SELECT flag, price_x100,
         SUM(wsum) OVER (PARTITION BY flag ORDER BY price_x100
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(wsum) OVER (PARTITION BY flag) AS total
  FROM per_price
)
SELECT flag,
       CAST(MIN(CASE WHEN 2 * cw >= total     THEN price_x100 END) AS BIGINT)
         AS wmedian_x100,
       CAST(MIN(CASE WHEN 10 * cw >= 9 * total THEN price_x100 END) AS BIGINT)
         AS wp90_x100
FROM cum GROUP BY flag ORDER BY flag
"""


@query("agg_weighted_percentile", oracle=_WEIGHTED_PCT_ORACLE)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median + weighted p90 of extended price, weighted by
    quantity, per return flag -- the lower-weighted-percentile
    definition (smallest value whose cumulative weight reaches p of the
    total), evaluated entirely in scaled integers: the threshold test
    is 2*cw >= total (and 10*cw >= 9*total), so no float boundary
    exists anywhere.

    Scale shape: weights pre-aggregate per (group, value) -- map-side
    combinable, collapsing ties -- then ONE window per group over the
    distinct-value table provides the cumulative weights, and a final
    conditional-min aggregate extracts both percentiles in the same
    pass. The reference's exact Percentile (catalyst/expressions/
    aggregate/Percentile.scala:58) buffers every value per group in one
    aggregator; this formulation keeps state distributed."""
    w = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_x100"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("wt"),
    )
    per_price = w.groupBy("flag", "price_x100").agg(F.sum("wt").alias("wsum"))
    from pyspark.sql import Window as W

    wc = (
        W.partitionBy("flag")
        .orderBy("price_x100")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = per_price.select(
        "flag",
        "price_x100",
        F.sum("wsum").over(wc).alias("cw"),
        F.sum("wsum").over(W.partitionBy("flag")).alias("total"),
    )
    return (
        cum.groupBy("flag")
        .agg(
            F.min(
                F.when(2 * F.col("cw") >= F.col("total"), F.col("price_x100"))
            ).alias("wmedian_x100"),
            F.min(
                F.when(
                    10 * F.col("cw") >= 9 * F.col("total"), F.col("price_x100")
                )
            ).alias("wp90_x100"),
        )
        .orderBy("flag")
    )


_EQUIDEPTH_BUCKETS = 8

_EQUIDEPTH_ORACLE = f"""
WITH w AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_x100
  FROM orders
), per_val AS (
  SELECT price_x100, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM w GROUP BY price_x100
), cum AS (
  SELECT price_x100, cnt,
         SUM(cnt) OVER (ORDER BY price_x100
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(cnt) OVER () AS total
  FROM per_val
), bucketed AS (
  -- bucket b = smallest b with cw <= ceil(total*(b+1)/K): assign each
  -- distinct value the bucket its cumulative rank lands in.
  SELECT price_x100, cnt,
         CAST(LEAST({_EQUIDEPTH_BUCKETS - 1},
               ((cw - 1) * {_EQUIDEPTH_BUCKETS}) // total) AS BIGINT)
           AS bucket
  FROM cum
)
SELECT bucket,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MIN(price_x100) AS BIGINT) AS lo_x100,
       CAST(MAX(price_x100) AS BIGINT) AS hi_x100
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


@query("agg_equidepth_histogram", oracle=_EQUIDEPTH_ORACLE)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (the optimizer-statistics kind): bucket
    edges at equal cumulative-count ranks rather than equal value
    widths. Assignment is pure integer arithmetic over the cumulative
    weights -- floor((cw-1)*K/total) -- so edges are deterministic; the
    window runs over the DISTINCT-value table (ties collapse map-side),
    the same bounded shape as the weighted-percentile operator."""
    from pyspark.sql import Window as W

    w = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_x100")
    )
    per_val = w.groupBy("price_x100").agg(F.count(F.lit(1)).alias("cnt"))
    wc = W.orderBy("price_x100").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_val.select(
        "price_x100",
        "cnt",
        F.sum("cnt").over(wc).alias("cw"),
        F.sum("cnt").over(W.partitionBy()).alias("total"),
    )
    bucket = F.least(
        F.lit(_EQUIDEPTH_BUCKETS - 1).cast("long"),
        F.expr(f"((cw - 1) * {_EQUIDEPTH_BUCKETS}) div total"),
    )
    return (
        cum.select("price_x100", "cnt", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.min("price_x100").alias("lo_x100"),
            F.max("price_x100").alias("hi_x100"),
        )
        .orderBy("bucket")
    )


_OLS_ORACLE = """
WITH pts AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pts GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(ROUND(1000000.0 *
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
         (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
         AS slope_x1m,
       CAST(ROUND(1000000.0 *
         (CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy) /
         (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
         AS intercept_x1m,
       CAST(ROUND(1000000.0 *
         ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) *
          (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)) /
         ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
          (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
         AS r2_x1m
FROM s
ORDER BY l_returnflag
"""


@query("agg_linear_regression", oracle=_OLS_ORACLE)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS (slope / intercept / R^2 of extendedprice vs
    quantity per returnflag) computed from EXACT integer sufficient
    statistics -- n, Sx, Sy, Sxy, Sxx, Syy accumulate as BIGINTs (one
    map-side-combinable aggregate, the same shuffle shape as any
    groupBy), and only the final slope/intercept/R2 formulas switch to
    double. Built-in regr_slope/regr_r2 fold doubles in partition order
    and can't hash-match across engines; sufficient statistics are the
    portable formulation. The int->double casts happen on identical
    values in both engines, so results agree bit-for-bit.

    Overflow headroom: Syy is the binding term -- ~2e18 at sf0.1, so
    BIGINT holds to roughly sf1-per-group; beyond that switch the
    accumulators to DECIMAL(38,0) (sum(col.cast("decimal(38,0)")) --
    same shuffle shape, exact to 38 digits).
    """
    pts = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    s = pts.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = F.col("sxy").cast("double"), F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return s.select(
        "l_returnflag",
        "n",
        F.round(F.lit(1_000_000.0) * cov / varx).cast("long").alias("slope_x1m"),
        F.round(F.lit(1_000_000.0) * (sy * sxx - sx * sxy) / varx)
        .cast("long").alias("intercept_x1m"),
        F.round(F.lit(1_000_000.0) * (cov * cov) / (varx * vary))
        .cast("long").alias("r2_x1m"),
    ).orderBy("l_returnflag")


_MODE_ORACLE = """
WITH freq AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus,
       arg_max(o_orderpriority, printf('%020d|%s', n, o_orderpriority))
         AS mode_priority,
       CAST(MAX(n) AS BIGINT) AS mode_count
FROM freq
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("agg_mode_deterministic", oracle=_MODE_ORACLE)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode with a deterministic tie-break: the most
    frequent o_orderpriority per order status, ties resolved to the
    LARGEST value. Spark's built-in mode() picks an arbitrary winner on
    ties (hash-map iteration order), which can never gate cross-engine;
    the portable shape is frequency groupBy + max_by over the
    (count, value) pair -- two map-side-combinable aggregates, shuffle
    volume = |distinct pairs| then |groups|.
    """
    freq = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        freq.groupBy("o_orderstatus")
        .agg(
            F.max_by(
                "o_orderpriority",
                F.format_string("%020d|%s", F.col("n"), F.col("o_orderpriority")),
            ).alias("mode_priority"),
            F.max("n").alias("mode_count"),
        )
        .orderBy("o_orderstatus")
    )


_MAD_ORACLE = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS v
  FROM orders GROUP BY o_custkey
), pts AS (
  SELECT c.c_mktsegment AS grp, s.o_custkey, s.v
  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
), med AS (
  SELECT grp, quantile_cont(CAST(v AS DOUBLE), 0.5) AS m
  FROM pts GROUP BY grp
), dev AS (
  SELECT p.grp, abs(p.v - med.m) AS ad, p.o_custkey
  FROM pts p JOIN med ON p.grp = med.grp
), mad AS (
  SELECT grp, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY grp
)
SELECT d.grp AS c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_outliers,
       CAST(MIN(d.o_custkey) AS BIGINT) AS first_outlier_cust
FROM dev d JOIN mad ON d.grp = mad.grp
WHERE d.ad > 3 * mad.mad
GROUP BY d.grp
ORDER BY c_mktsegment
"""


@query("agg_mad_outliers", oracle=_MAD_ORACLE)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: flag customers whose total
    spend deviates from their market segment's median by more than 3x
    the median absolute deviation (MAD) -- the robust-statistics
    alternative to z-scores (median/MAD ignore the outliers they hunt;
    mean/stddev don't). Spend totals are skewed by order count, so the
    flag fires on real rows at gate scale.

    Scale shape: two passes over the fact -- one exact-percentile
    aggregate for the medians (tiny result, broadcast back), then the
    deviation scan + second percentile for MAD (broadcast again), then
    the flagging scan. Prices enter as x100 BIGINTs so the exact
    interpolated medians land on half-steps -- bit-equal across engines
    (deviation from the group median exceeding 3x MAD is a strict float
    compare of exact .5-granular values). On a 100 TB fact, swap the
    exact percentile for approx_percentile and keep the join shape.
    """
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("grp")
    )
    pts = spend.join(cust, "o_custkey")
    med = pts.groupBy("grp").agg(
        F.percentile(F.col("v").cast("double"), F.lit(0.5)).alias("m")
    )
    dev = pts.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("v") - F.col("m")).alias("ad"), "o_custkey"
    )
    mad = dev.groupBy("grp").agg(F.percentile("ad", F.lit(0.5)).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "grp")
        .filter(F.col("ad") > 3 * F.col("mad"))
        .groupBy(F.col("grp").alias("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.min("o_custkey").alias("first_outlier_cust"),
        )
        .orderBy("c_mktsegment")
    )


_WINSOR_ORACLE = """
WITH pts AS (
  SELECT o_orderstatus AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
), q AS (
  SELECT grp,
         quantile_cont(CAST(v AS DOUBLE), 0.25) AS lo,
         quantile_cont(CAST(v AS DOUBLE), 0.75) AS hi
  FROM pts GROUP BY grp
), clipped AS (
  SELECT p.grp,
         CAST(ROUND(LEAST(GREATEST(CAST(p.v AS DOUBLE), q.lo), q.hi) * 4)
              AS BIGINT) AS c4,
         CASE WHEN p.v < q.lo THEN 1 ELSE 0 END AS is_lo,
         CASE WHEN p.v > q.hi THEN 1 ELSE 0 END AS is_hi
  FROM pts p JOIN q ON p.grp = q.grp
)
SELECT grp AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(is_lo) AS BIGINT) AS n_clipped_low,
       CAST(SUM(is_hi) AS BIGINT) AS n_clipped_high,
       CAST(ROUND(CAST(SUM(c4) AS DOUBLE) / (4 * COUNT(*))) AS BIGINT)
         AS winsor_mean_x100
FROM clipped
GROUP BY grp
ORDER BY o_orderstatus
"""


@query("agg_winsorized_stats", oracle=_WINSOR_ORACLE)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: clip order totals to the [p25, p75]
    interquartile band, then average -- the outlier-robust mean a
    metrics pipeline reports next to the raw one.

    Exactness: values enter as x100 BIGINTs; quartile positions have
    quarter fractions, and every interpolation intermediate
    (int + int * {0, .25, .5, .75}) is exactly representable in double,
    so both engines produce identical quartiles. Clipped values are
    quarter-granular, so they re-scale x4 to BIGINTs and SUM exactly --
    the mean is one double division at the end, never a float fold.

    Scale shape: one percentile aggregate (broadcast back) + one
    clipping scan with a map-side-combinable sum.
    """
    pts = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    q = pts.groupBy("grp").agg(
        F.percentile(F.col("v").cast("double"), F.lit(0.25)).alias("lo"),
        F.percentile(F.col("v").cast("double"), F.lit(0.75)).alias("hi"),
    )
    clipped = pts.join(F.broadcast(q), "grp").select(
        "grp",
        F.round(
            F.least(
                F.greatest(F.col("v").cast("double"), F.col("lo")),
                F.col("hi"),
            )
            * 4
        ).cast("long").alias("c4"),
        F.when(F.col("v") < F.col("lo"), 1).otherwise(0).alias("is_lo"),
        F.when(F.col("v") > F.col("hi"), 1).otherwise(0).alias("is_hi"),
    )
    return (
        clipped.groupBy(F.col("grp").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_lo").cast("long").alias("n_clipped_low"),
            F.sum("is_hi").cast("long").alias("n_clipped_high"),
            F.round(
                F.sum("c4").cast("double") / (4 * F.count(F.lit(1)))
            ).cast("long").alias("winsor_mean_x100"),
        )
        .orderBy("o_orderstatus")
    )


_DECIMAL_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
         AS sum_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR)
         AS sum_disc_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("agg_decimal_exact_sums", oracle=_DECIMAL_ORACLE)
def agg_decimal_exact_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL-typed aggregation (the reference's Decimal/UnscaledValue
    path -- catalyst/expressions/decimalExpressions.scala, Sum's
    DecimalType branch): prices cast to DECIMAL(12,2) sum EXACTLY with
    no scaling tricks, because decimal arithmetic is defined to be
    exact in both engines -- the type a financial pipeline should use
    instead of the x100-BIGINT workaround the double-typed columns
    force everywhere else. The product term exercises decimal
    multiplication scale propagation (12,2 x 12,2 -> sum over 24,4);
    the final sums cross the gate as their canonical string rendering
    (both engines print the full scale; pandas would otherwise coerce
    DuckDB decimals to float and drop trailing zeros)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).cast("string").alias("sum_price"),
            F.sum(price * disc).cast("string").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


_STRAGG_ORACLE = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@query("agg_string_concat_sorted", oracle=_STRAGG_ORACLE)
def agg_string_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (DuckDB string_agg ... ORDER BY,
    Spark's collect_list + sort + concat_ws) -- the LISTAGG surface.
    Sorting inside the aggregate is what makes the concatenation
    deterministic; an unsorted collect_list order is partition-
    dependent and could never gate."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias(
                "nations_csv"
            )
        )
        .orderBy("r_name")
    )


_GROUPING_ID_ORACLE = """
SELECT r_name, n_name,
       CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
       COUNT(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, n_name)
ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST
"""


@query("agg_grouping_id_cube", oracle=_GROUPING_ID_ORACLE)
def agg_grouping_id_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id() over CUBE -- the bitmask that distinguishes every
    subtotal level in one column (ANSI convention: lowest bit = last
    grouping column; Spark's grouping_id() and DuckDB's multi-argument
    GROUPING agree on it), the practical alternative to one grouping()
    flag per column when rollup consumers route rows by level."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.cube("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
        )
        .select("r_name", "n_name", "gid", "n")
        .orderBy(
            "gid",
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


_ROLLUP_SHARE_ORACLE = """
WITH r AS (
  SELECT o_orderstatus, o_orderpriority,
         GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_x100
  FROM orders
  GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
), tot AS (
  SELECT rev_x100 AS grand FROM r WHERE g_s = 1 AND g_p = 1
), parent AS (
  SELECT o_orderstatus, rev_x100 AS status_rev
  FROM r WHERE g_s = 0 AND g_p = 1
)
SELECT COALESCE(r.o_orderstatus, '(all)') AS status,
       COALESCE(r.o_orderpriority, '(all)') AS priority,
       r.rev_x100,
       CAST(1000000 * r.rev_x100 // t.grand AS BIGINT) AS share_of_total_x1m,
       CAST(CASE WHEN r.g_p = 0
                 THEN 1000000 * r.rev_x100 // p.status_rev
                 ELSE NULL END AS BIGINT) AS share_of_status_x1m
FROM r
CROSS JOIN tot t
LEFT JOIN parent p ON r.o_orderstatus = p.o_orderstatus AND r.g_s = 0
ORDER BY status, priority
"""


@query("agg_rollup_share_of_parent", oracle=_ROLLUP_SHARE_ORACLE)
def agg_rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent percentages over a ROLLUP lattice: every
    (status, priority) cell carries its share of the grand total AND
    of its status subtotal -- the OLAP readout reports bolt onto every
    rollup, computed by joining the lattice back to its own parent
    levels (selected via GROUPING()) instead of re-scanning the fact.
    Exact x1m integer shares.

    Scale shape: ONE fact aggregation produces the whole lattice; the
    share joins run lattice-to-lattice (|groups| rows, broadcast-able).
    """
    o = load_table(spark, sf_dir, "orders")
    r = o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_x100"
        ),
        F.grouping("o_orderstatus").alias("g_s"),
        F.grouping("o_orderpriority").alias("g_p"),
    )
    from ushas_spark.durability import materialize

    r = materialize(r)
    tot = r.filter((F.col("g_s") == 1) & (F.col("g_p") == 1)).select(
        F.col("rev_x100").alias("grand")
    )
    parent = r.filter((F.col("g_s") == 0) & (F.col("g_p") == 1)).select(
        F.col("o_orderstatus").alias("p_status"),
        F.col("rev_x100").alias("status_rev"),
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(parent),
            (F.col("o_orderstatus") == F.col("p_status"))
            & (F.col("g_s") == 0),
            "left",
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "rev_x100",
            F.expr("1000000 * rev_x100 div grand").alias(
                "share_of_total_x1m"
            ),
            F.when(
                F.col("g_p") == 0,
                F.expr("1000000 * rev_x100 div status_rev"),
            )
            .cast("long")
            .alias("share_of_status_x1m"),
        )
        .orderBy("status", "priority")
    )
