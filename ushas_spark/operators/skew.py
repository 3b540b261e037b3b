"""Skew-mitigation: salted joins and salted aggregation.

At 100 TB a handful of hot keys (the null key, a default account id, a
bot user) can put an entire join or aggregation on one task. Two levers:

1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
   our session defaults) -- handles the JOIN case at runtime by splitting
   oversized partitions.
2. Explicit salting (this module) -- works for aggregations too, on any
   Spark version, and makes the mitigation visible/plannable: the hot
   side's key becomes (key, salt) with salt in [0, S); the small side is
   replicated S times; results are exact because every (key, salt) pair
   still meets its match.

Both produce identical results to the plain operation -- which is exactly
what the oracle gate checks (the salted query's oracle is the PLAIN SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The big side's salt is ``pmod(xxhash64(<all row cols>), S)`` --
    deterministic under task retry/speculation (a retried task re-derives
    the SAME salt; monotonically_increasing_id would re-salt rows
    differently mid-query). The small side explodes to all salts, so
    every big row finds its partner in exactly one (key, salt) bucket.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    joined = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["_salt"] == salted_small["_salt"]),
        how,
    )
    return joined.drop("_salt")


def salted_aggregate_counts(
    df: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase aggregation through a salted key: partial counts per
    (key, salt), then final per key. For COUNT/SUM-class aggregates this
    is exact; the first shuffle spreads a hot key over n_salts reducers.
    Salt is retry-deterministic (xxhash64 of the row, not a partition-
    indexed id)."""
    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
        )
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial_n"))
    )
    return partial.groupBy(key).agg(F.sum("_partial_n").alias("n"))


_SKEW_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("skew_salted_aggregation", oracle=_SKEW_ORACLE)
def skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a LOW-cardinality key (5
    priorities -- the classic hot-key shape): result identical to the
    plain GROUP BY, but the first shuffle fans each key across 8
    reducers. The oracle is the plain SQL -- exactness is the point."""
    o = load_table(spark, sf_dir, "orders")
    return salted_aggregate_counts(o, "o_orderpriority").orderBy("o_orderpriority")


_SKEW_JOIN_ORACLE = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@query("skew_salted_join", oracle=_SKEW_JOIN_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join: customer keys concentrate on 25 nations
    (hot-key shape). Small side replicated 8x; the result must equal the
    plain join -- the oracle checks exactly that."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = salted_join(cust, nation, "c_nationkey", "n_nationkey", n_salts=8)
    return (
        joined.groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_name")
    )
