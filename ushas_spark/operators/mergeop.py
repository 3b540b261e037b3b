"""SCD2 (slowly-changing-dimension, type 2) merge as a batch operator.

The MERGE-INTO workload every warehouse pipeline runs nightly: given a
current dimension snapshot (one open row per key) and a batch of
updates, close the rows whose tracked value changed (set ``valid_to``)
and append the new versions, leaving untouched keys alone. The reference
fork has no MERGE statement (Spark 2.4's parser predates it —
sql/catalyst/src/main/antlr4/.../SqlBase.g4); engines layer it on joins
exactly like this.

Spark shape (100 TB lens): one aggregation over the fact table builds
the update set (map-side combinable, keyed on the dimension key), then
a single shuffle keyed on the dimension key feeds the changed/unchanged
split — Catalyst reuses the exchange across the semi/anti branches. The
three result legs (untouched ∪ closed ∪ new) are a union of
narrow transformations over those two shuffles; no collect, no windows.

Determinism: the tracked value is an exact scaled-integer balance
(ROUND(x*100) -> BIGINT sums), so "changed" is an integer comparison
with no float drift, and the DuckDB oracle reproduces the merge
bit-for-bit.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query

DIM_START = datetime.date(1992, 1, 1)
KEY_CAP = 150  # output slice: full merged history for custkey <= 150


def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged SCD2 customer-balance history.

    Current snapshot: each customer's account balance (cents). Updates:
    lifetime order spend (cents) + last order date per customer, derived
    from ``orders``. Keys whose spend total differs from the snapshot
    balance get their open row closed at the last order date and a new
    open row appended.
    """
    cur = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_x100"),
        F.lit(DIM_START).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "new_bal_x100"
            ),
            F.max("o_orderdate").alias("change_date"),
        )
    )
    changed = cur.join(upd, cur.c_custkey == upd.o_custkey).where(
        F.col("new_bal_x100") != F.col("bal_x100")
    )
    closed = changed.select(
        "c_custkey",
        "bal_x100",
        "valid_from",
        F.col("change_date").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_rows = changed.select(
        "c_custkey",
        F.col("new_bal_x100").alias("bal_x100"),
        F.col("change_date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    untouched = cur.join(
        changed.select("c_custkey"), "c_custkey", "left_anti"
    )
    return untouched.unionByName(closed).unionByName(new_rows)


_MERGE_CTES = f"""
cur AS (
  SELECT c_custkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_x100,
         DATE '{DIM_START.isoformat()}' AS valid_from,
         CAST(NULL AS DATE) AS valid_to,
         TRUE AS is_current
  FROM customer),
upd AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS new_bal_x100,
         MAX(o_orderdate) AS change_date
  FROM orders GROUP BY o_custkey),
changed AS (
  SELECT cur.*, upd.new_bal_x100, upd.change_date
  FROM cur JOIN upd ON c_custkey = o_custkey
  WHERE new_bal_x100 <> bal_x100),
merged AS (
  SELECT c_custkey, bal_x100, valid_from, valid_to, is_current
  FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, bal_x100, valid_from, change_date, FALSE FROM changed
  UNION ALL
  SELECT c_custkey, new_bal_x100, change_date, CAST(NULL AS DATE), TRUE
  FROM changed)
"""

_SLICE_ORACLE = f"""
WITH {_MERGE_CTES}
SELECT c_custkey, bal_x100, valid_from, valid_to, is_current
FROM merged WHERE c_custkey <= {KEY_CAP}
ORDER BY c_custkey, is_current
"""


@query("merge_scd2_upsert", oracle=_SLICE_ORACLE)
def merge_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged history slice (custkey <= {KEY_CAP}) — row-level gate."""
    return (
        scd2_merge(spark, sf_dir)
        .where(F.col("c_custkey") <= KEY_CAP)
        .orderBy("c_custkey", "is_current")
    )


_STATS_ORACLE = f"""
WITH {_MERGE_CTES}
SELECT is_current,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(bal_x100) AS BIGINT) AS total_bal_x100,
       CAST(COUNT(valid_to) AS BIGINT) AS n_closed_dates
FROM merged GROUP BY is_current ORDER BY is_current
"""


@query("merge_scd2_stats", oracle=_STATS_ORACLE)
def merge_scd2_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table merge accounting (the 100 TB-shape output: the full
    merged history stays distributed, only 2 audit rows come back)."""
    return (
        scd2_merge(spark, sf_dir)
        .groupBy("is_current")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("bal_x100").alias("total_bal_x100"),
            F.count("valid_to").alias("n_closed_dates"),
        )
        .orderBy("is_current")
    )


# --- CDC apply: log of I/U/D operations -> final snapshot ------------------
# The Hudi/Delta CDC-merge primitive, derived deterministically from
# orders: each order becomes an op row; the op type comes from a
# portable integer modulo (NOT an engine hash function -- DuckDB's
# hash() and Spark's differ) so ~10% deletes / 10% inserts / 80%
# updates occur; latest sequence wins, delete removes the key.
_CDC_ORACLE = """
WITH log AS (
  SELECT o_custkey AS key,
         o_orderkey AS seq,
         CASE o_orderkey % 10
           WHEN 0 THEN 'D' WHEN 1 THEN 'I' ELSE 'U' END AS op,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS val_x100
  FROM orders
), latest AS (
  SELECT key, seq, op, val_x100 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM log) WHERE rn = 1
)
SELECT key, CAST(seq AS BIGINT) AS last_seq, val_x100
FROM latest WHERE op <> 'D'
ORDER BY key
"""


@query("merge_cdc_apply", oracle=_CDC_ORACLE)
def merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC operation log (insert/update/delete, sequenced) to
    produce the latest snapshot: one shuffle on the key, latest-wins by
    sequence, deletes drop the key.

    Latest-wins argmax via window row_number (deterministic: sequence
    numbers are unique per key). Op type derives from a portable
    integer modulo, not an engine hash -- see the module comment.
    """
    orders = load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 10 == 0, "D")
        .when(F.col("o_orderkey") % 10 == 1, "I")
        .otherwise("U")
        .alias("op"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("val_x100"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("key").orderBy(F.col("seq").desc())
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        latest.where(F.col("op") != "D")
        .select("key", F.col("seq").alias("last_seq"), "val_x100")
        .orderBy("key")
    )


# --- point-in-time query over the SCD2 history -----------------------------
_ASOF_DATE = "1999-06-01"

_SNAPSHOT_ORACLE = f"""
WITH {_MERGE_CTES}
SELECT c_custkey, bal_x100
FROM merged
WHERE valid_from <= TIMESTAMP '{_ASOF_DATE}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_ASOF_DATE}')
  AND c_custkey <= {KEY_CAP}
ORDER BY c_custkey
"""


@query("merge_scd2_asof_snapshot", oracle=_SNAPSHOT_ORACLE)
def merge_scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read of the SCD2 history: the one
    row per key whose [valid_from, valid_to) interval covers the as-of
    instant. The query every temporal dimension exists to answer; a
    pure filter over the history table, so at 100 TB it rides the
    valid_from/valid_to parquet min-max stats (and partition pruning if
    the history is partitioned by valid_from month)."""
    cut = F.lit(_ASOF_DATE).cast("timestamp")
    m = scd2_merge(spark, sf_dir)
    return (
        m.where(
            (F.col("valid_from").cast("timestamp") <= cut)
            & (F.col("valid_to").isNull() | (F.col("valid_to").cast("timestamp") > cut))
            & (F.col("c_custkey") <= KEY_CAP)
        )
        .select("c_custkey", "bal_x100")
        .orderBy("c_custkey")
    )
