"""Range (band) join and hypertable-style time-bucket rollup.

The reference has NO dedicated range-join operator: an inequality-only
join falls back to BroadcastNestedLoopJoin / CartesianProduct
(reference: sql/core/src/main/scala/org/apache/spark/sql/execution/
SparkStrategies.scala:248-276, joins/BroadcastNestedLoopJoinExec.scala),
which is O(n*m) and dies at scale. This module adds the standard
large-scale formulation -- **bucketed band join**: quantise time into
fixed-width buckets no narrower than the band, explode the probe side
into the (at most 2) buckets its band can touch, equi-join on the
bucket, then re-check the exact predicate. Catalyst plans the bucket
equi-join as a shuffled hash / sort-merge join, so the cost is
O(n + m + matches) with ONE shuffle on the bucket key -- the same trick
Databricks' range-join optimization and PostGIS tiling use.

Cost model at 100 TB: bucket width == band width caps the probe-side
fan-out at 2x; each bucket is a normal shuffle partition key (time
buckets are near-uniform for event streams, so no skew salting needed).
A BNLJ at this scale would be ~10^9 x more comparisons.

The time-bucket rollup is the hypertable continuous-aggregate pattern
(TimescaleDB-style): aggregate once at fine grain with EXACT scaled-
integer partial sums, then re-aggregate coarse grains FROM the fine
aggregate -- the reaggregation reads the (tiny) hourly relation, not the
raw events, which is what makes maintaining day/week/month rollups over
100 TB of events affordable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.oracle_exact import SCALE, dec_sum, sql_dec_sum
from ushas_spark.registry import query

# 10 minutes in microseconds: band width AND bucket width. Keeping them
# equal means any band (t-10min, t) spans at most 2 buckets.
_BAND_US = 10 * 60 * 1_000_000


def banded_self_join(events: DataFrame, band_us: int) -> DataFrame:
    """Pairs (a, b) of events with ``a.ts - band < b.ts < a.ts``.

    Returns the probe row's columns plus the matched row's ``b_event_id``
    / ``b_value``. Exact semantics of the naive theta join, planned as a
    bucket equi-join (no BNLJ).
    """
    with_bucket = events.withColumn(
        "_bkt", F.expr(f"unix_micros(ts) DIV {band_us}")
    )
    # Probe side: the band (ts - band, ts) only intersects bucket(ts) and
    # bucket(ts)-1, so a 2-way explode bounds the fan-out.
    probe = with_bucket.select(
        F.col("event_id").alias("a_event_id"),
        F.col("ts").alias("a_ts"),
        F.explode(F.array(F.col("_bkt") - 1, F.col("_bkt"))).alias("_bkt"),
    )
    build = with_bucket.select(
        F.col("_bkt"),
        F.col("event_id").alias("b_event_id"),
        F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"),
    )
    pairs = probe.join(build, "_bkt").where(
        (F.col("b_ts") < F.col("a_ts"))
        & (F.col("b_ts") > F.col("a_ts") - F.expr(f"INTERVAL {band_us} MICROSECOND"))
    )
    return pairs


_RANGE_ORACLE = f"""
SELECT a.event_id,
       COUNT(*) AS n_preceding,
       {sql_dec_sum('b.value', 'preceding_value_sum')}
FROM events a
JOIN events b
  ON b.ts > a.ts - INTERVAL 10 MINUTE AND b.ts < a.ts
GROUP BY a.event_id
ORDER BY a.event_id
"""


@query("join_range_banded", oracle=_RANGE_ORACLE)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: count + value-sum of events in the 10 minutes before it
    (strict band, no equality key). Oracle is the naive inequality join;
    ours is the bucketed band join -- same rows, shuffle-join plan.
    """
    events = load_table(spark, sf_dir, "events")
    pairs = banded_self_join(events, _BAND_US)
    return (
        pairs.groupBy(F.col("a_event_id").alias("event_id"))
        .agg(
            F.count("*").alias("n_preceding"),
            dec_sum(F.col("b_value"), "preceding_value_sum"),
        )
        .orderBy("event_id")
    )


_ROLLUP_ORACLE = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n_events,
       {sql_dec_sum('value', 'value_sum')}
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


@query("agg_time_bucket_rollup", oracle=_ROLLUP_ORACLE)
def agg_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: hourly buckets aggregated from raw events,
    daily buckets re-aggregated FROM the hourly relation (not the raw
    table). Partial sums stay exact scaled BIGINTs until the final
    division, so the two-level reaggregation is bit-identical to the
    oracle's one-level daily aggregate.
    """
    events = load_table(spark, sf_dir, "events")
    f = 10**SCALE
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_h"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * f).cast("long")).alias("s"),
    )
    daily = (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "bucket_h"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("s").cast("double") / float(f)).alias("value_sum"),
        )
        .orderBy("day", "event_type")
    )
    return daily


# --- incremental aggregate maintenance (materialized-view merge) ----------
_CUTOVER = "1999-01-01"

_INCR_ORACLE = f"""
WITH state AS (
  SELECT date_trunc('month', o_orderdate) AS mon, o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS tot_x100
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOVER}'
  GROUP BY 1, 2
), delta AS (
  SELECT date_trunc('month', o_orderdate) AS mon, o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS tot_x100
  FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOVER}'
  GROUP BY 1, 2
), merged AS (
  SELECT mon, prio, CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(tot_x100) AS BIGINT) AS tot_x100
  FROM (SELECT * FROM state UNION ALL SELECT * FROM delta)
  GROUP BY mon, prio
)
SELECT mon, prio, n, tot_x100,
       CAST(tot_x100 AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS avg_price
FROM merged ORDER BY mon, prio
"""


def _partials(orders: DataFrame) -> DataFrame:
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        F.col("o_orderpriority").alias("prio"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "tot_x100"
        ),
    )


@query("agg_incremental_merge", oracle=_INCR_ORACLE)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view incremental maintenance: merge stored partial
    aggregates with a new-data delta WITHOUT rescanning history.

    The mergeable-state pattern behind every incremental rollup
    (reference analog: the partial->final two-phase aggregation in
    execution/aggregate/AggUtils.scala, lifted to the storage layer):
    state rows carry (count, exact scaled sum) per (month, priority);
    the delta batch aggregates the same partials; the merge is an
    addition, and finals (avg) are derived only at read time. Both
    scans push their date predicate down; at 100 TB the "state" side is
    a tiny stored table, not a scan, and the plan shape is identical.
    """
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit(_CUTOVER).cast("timestamp")
    state = _partials(orders.where(F.col("o_orderdate") < cut))
    delta = _partials(orders.where(F.col("o_orderdate") >= cut))
    merged = (
        state.unionByName(delta)
        .groupBy("mon", "prio")
        .agg(F.sum("n").alias("n"), F.sum("tot_x100").alias("tot_x100"))
    )
    return merged.select(
        "mon",
        "prio",
        "n",
        "tot_x100",
        (
            F.col("tot_x100").cast("double")
            / F.lit(100.0)
            / F.col("n").cast("double")
        ).alias("avg_price"),
    ).orderBy("mon", "prio")


# --- interval-overlap join (interval x interval, banded) -------------------
_IV_YEAR = 1998
_IV_CUST_CAP = 30
_IV_BAND_DAYS = 16

_OVERLAP_ORACLE = f"""
WITH o98 AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(date_diff('day', DATE '{_IV_YEAR}-01-01', o_orderdate) AS BIGINT)
           AS doy,
         CAST(month(o_orderdate) AS BIGINT) AS m
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_IV_YEAR}-01-01'
    AND o_orderdate < TIMESTAMP '{_IV_YEAR + 1}-01-01'
), a AS (
  SELECT o_custkey AS ck, m AS am,
         CAST(MIN(doy) AS BIGINT) AS astart, CAST(MAX(doy) AS BIGINT) AS aend
  FROM o98 WHERE o_custkey <= {_IV_CUST_CAP} GROUP BY 1, 2
), b AS (
  SELECT l_suppkey AS sk, m AS sm,
         CAST(MIN(doy) AS BIGINT) AS bstart, CAST(MAX(doy) AS BIGINT) AS bend
  FROM o98 JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
)
SELECT ck, am, sk, sm, astart, aend, bstart, bend
FROM a JOIN b ON astart <= bend AND bstart <= aend
ORDER BY ck, am, sk, sm
"""


@query("join_interval_overlap", oracle=_OVERLAP_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap join -- both sides are interval SETS
    (customer-month and supplier-month activity spans), matched where
    the spans intersect. This is the shape beyond the point-in-band
    range join: neither side is a point, so the banded plan explodes
    EACH side to its covered {_IV_BAND_DAYS}-day bands, equi-joins on
    the band (an ordinary hash join Catalyst shuffles/broadcasts like
    any other), dedupes pairs that share multiple bands, and verifies
    the exact overlap predicate -- never a nested-loop over the
    cross product. Oracle runs the direct quadratic join; results are
    identical because banding is complete (an overlap implies at least
    one shared band).
    """
    o = load_table(spark, sf_dir, "orders")
    o98 = o.where(
        (F.col("o_orderdate") >= F.lit(f"{_IV_YEAR}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{_IV_YEAR + 1}-01-01").cast("timestamp"))
    ).select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lit(f"{_IV_YEAR}-01-01").cast("date")
        ).cast("long").alias("doy"),
        F.month("o_orderdate").cast("long").alias("m"),
    )
    a = (
        o98.where(F.col("o_custkey") <= _IV_CUST_CAP)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("m").alias("am"))
        .agg(F.min("doy").alias("astart"), F.max("doy").alias("aend"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    b = (
        o98.join(li, o98.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_suppkey").alias("sk"), F.col("m").alias("sm"))
        .agg(F.min("doy").alias("bstart"), F.max("doy").alias("bend"))
    )
    band = lambda lo, hi: F.explode(
        F.sequence(
            (F.col(lo) / _IV_BAND_DAYS).cast("long"),
            (F.col(hi) / _IV_BAND_DAYS).cast("long"),
        )
    )
    ab = a.select("*", band("astart", "aend").alias("band"))
    bb = b.select("*", band("bstart", "bend").alias("band"))
    return (
        ab.join(bb, "band")
        .where(
            (F.col("astart") <= F.col("bend"))
            & (F.col("bstart") <= F.col("aend"))
        )
        .dropDuplicates(["ck", "am", "sk", "sm"])
        .select("ck", "am", "sk", "sm", "astart", "aend", "bstart", "bend")
        .orderBy("ck", "am", "sk", "sm")
    )
