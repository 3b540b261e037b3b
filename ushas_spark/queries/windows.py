"""Window-function coverage (SURVEY.md section 2.5).

Reference surface: logical Window (basicLogicalOperators.scala:602),
physical WindowExec with per-partition buffering + spill (execution/window/
WindowExec.scala:81), frame processors (WindowFunctionFrame.scala), the
ranking/offset function family (catalyst/expressions/windowExpressions
.scala:422-734). All builtin in PySpark.

Determinism rules applied throughout:
- every window ORDER BY ends in a unique tiebreaker column, so ranks and
  offsets are total-order stable;
- running/framed SUMs accumulate scaled BIGINTs (exact, engine-portable)
  instead of doubles -- engines disagree on frame-evaluation order for
  float sums (segment trees vs running accumulators), integers don't care.

Scale note: a window over PARTITION BY k shuffles on k once; WindowExec
buffers one partition per task, spilling if a single key exceeds memory
(reference: ExternalAppendOnlyUnsafeRowArray.scala:45). Skewed partition
keys are the main hazard at 100 TB -- prefer high-cardinality partition
keys, or pre-aggregate before windowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query


@query(
    "window_topk_per_group",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY c_custkey, rn
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: the canonical row_number pattern. One shuffle on
    the partition key; no global sort (contrast with global top-k which
    plans TakeOrderedAndProject, reference: execution/limit.scala:124)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 100.0 AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum (ROWS UNBOUNDED PRECEDING .. CURRENT ROW) over exact
    scaled integers -- see module docstring for why not raw doubles."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    scaled = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled).over(w).cast("double") / 100.0).alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset functions Lag/Lead incl. explicit offset+default
    (reference: windowExpressions.scala:422,452)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_rank_family",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       PERCENT_RANK() OVER w AS prnk,
       CUME_DIST()    OVER w AS cdist,
       NTILE(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderstatus)
ORDER BY o_orderkey
""",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank family incl. ties (ORDER BY a non-unique column exercises
    rank-vs-dense_rank gap semantics; reference: windowExpressions.scala
    :684,706,734,526,561)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    wq = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(wq).alias("quartile"),
    ).orderBy("o_orderkey")


@query(
    "window_rows_frame",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
            OVER w AS DOUBLE) / 100.0 AS qty_last3,
       COUNT(*) OVER w AS n_last3
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY l_suppkey, l_orderkey, l_linenumber
""",
)
def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (moving sum/count over the last 3 rows;
    reference frame spec: windowExpressions.scala:182 SpecifiedWindowFrame).
    ORDER BY is a total order within each partition -- (orderkey,
    linenumber) alone ties in this data, which would make frame contents
    engine-arbitrary."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .rowsBetween(-2, W.currentRow)
    )
    scaled = F.round(F.col("l_quantity") * 100).cast("long")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(scaled).over(w).cast("double") / 100.0).alias("qty_last3"),
        F.count("*").over(w).alias("n_last3"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@query(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_totalprice,
       COUNT(*) OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1k
FROM orders
ORDER BY o_orderkey
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame over a numeric ordering column. NOTE: an
    un-partitioned window is a single-task bottleneck at scale -- fine for
    result sets that already fit one partition, otherwise add a partition
    key (this query exists to pin RANGE frame semantics)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice").rangeBetween(-1000, W.currentRow)
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_1k"),
    ).orderBy("o_orderkey")


@query(
    "window_first_last_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_key,
       LAST_VALUE(o_orderkey)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value with explicit full frame for
    last_value (the default frame ends at CURRENT ROW -- classic
    correctness trap, identical in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_orderkey").over(w).alias("first_key"),
        F.last_value("o_orderkey").over(wfull).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    ).orderBy("o_custkey", "o_orderkey")


_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
       (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_s
FROM sess
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


@query("window_sessionize_gaps", oracle=_SESSIONIZE_ORACLE)
def window_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-minute-gap sessions via lag -> boundary
    flag -> running sum (the batch twin of streaming_session_window).
    Two window passes over ONE shuffle on user_id -- both windows share
    the (user_id, ts, event_id) sort order so Catalyst plans a single
    Exchange + Sort feeding both Window operators. Duration math stays in
    integer microseconds (epoch), so the oracle comparison is exact.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_us = 30 * 60 * 1_000_000
    marked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > gap_us
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = marked.withColumn("session_idx", F.sum("new_sess").over(wrun))
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("t_start"),
            F.expr(
                "(unix_micros(max(ts)) - unix_micros(min(ts))) DIV 1000000"
            ).alias("duration_s"),
        )
        .orderBy("user_id", "session_idx")
    )


_GAP_FILL_ORACLE = """
WITH s AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 < 3 THEN NULL ELSE o_totalprice END AS sparse_val
  FROM orders
)
SELECT o_orderkey, o_orderstatus, sparse_val,
       last_value(sparse_val IGNORE NULLS) OVER (
         PARTITION BY o_orderstatus ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_val
FROM s
ORDER BY o_orderstatus, o_orderkey
"""


@query("window_gap_fill_locf", oracle=_GAP_FILL_ORACLE)
def window_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: last_value IGNORE NULLS
    over a running frame (the timeseries forward-fill operator; reference
    windowExpressions.scala Lead/Lag ignoreNulls flags). Leading rows of a
    partition with no prior observation stay NULL in both engines. One
    shuffle on the partition key; no Python."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sparse = F.when(F.col("o_orderkey") % 7 < 3, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            sparse.alias("sparse_val"),
        )
        .withColumn("filled_val", F.last("sparse_val", ignorenulls=True).over(w))
        .orderBy("o_orderstatus", "o_orderkey")
    )


_DRAWDOWN_ORACLE = """
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS ym,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_x100
  FROM orders GROUP BY 1
), cum AS (
  SELECT ym, rev_x100,
         SUM(rev_x100 - 45000000000) OVER (ORDER BY ym
             ROWS UNBOUNDED PRECEDING) AS equity
  FROM monthly
), dd AS (
  SELECT ym, equity,
         MAX(equity) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS peak
  FROM cum
)
SELECT ym,
       CAST(equity AS BIGINT) AS equity_x100,
       CAST(peak AS BIGINT) AS peak_x100,
       CAST(peak - equity AS BIGINT) AS drawdown_x100
FROM dd
ORDER BY ym
"""


@query("window_max_drawdown", oracle=_DRAWDOWN_ORACLE)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown over a monthly equity curve (revenue minus
    a fixed monthly baseline, cumulated) -- the risk metric every
    financial timeseries system computes, and the canonical
    running-max-minus-current window composition: one cumulative SUM
    window feeding one cumulative MAX window, both over the same tiny
    |months| ordering. Exact x100 integers end to end."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("ym")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_x100")
    )
    w = W.orderBy("ym").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = monthly.select(
        "ym",
        F.sum(F.col("rev_x100") - 45_000_000_000).over(w).alias("equity"),
    )
    dd = cum.select(
        "ym",
        "equity",
        F.max("equity").over(w).alias("peak"),
    )
    return dd.select(
        "ym",
        F.col("equity").alias("equity_x100"),
        F.col("peak").alias("peak_x100"),
        (F.col("peak") - F.col("equity")).alias("drawdown_x100"),
    ).orderBy("ym")


_RUNNING_DISTINCT_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS occ
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS distinct_types_so_far
FROM seq
ORDER BY user_id, event_id
"""


@query("window_running_distinct", oracle=_RUNNING_DISTINCT_ORACLE)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window -- which Spark (and
    standard SQL) does not support directly -- via the first-occurrence
    decomposition: row_number over (user, type) marks each type's first
    event, and a running SUM of those marks equals the distinct count
    so far. Both windows share the user_id partitioning, so the
    workaround costs the same single shuffle the illegal form would.
    Deterministic through the (ts, event_id) tiebreak."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w_occ = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    seq = e.withColumn("occ", F.row_number().over(w_occ))
    return (
        seq.select(
            "user_id",
            "event_id",
            F.sum(F.when(F.col("occ") == 1, 1).otherwise(0))
            .over(w_run).cast("long").alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "event_id")
    )
