"""r12 probe (VERDICT r11 item 7): HITS per-round join strategy.

Shipped formulation: per round, two E-row SMJs over pinned layouts
(pairs by cust, pairs by supp) + two small post-partial-agg exchanges
(groupBy on the OTHER key). Probe: swap the pins to the GROUPBY keys
(pairs by supp for the authority half, by cust for the hub half) and
join the |V|-row score table in as the build side -- then each
half-round's groupBy is co-partitioned with the streamed pairs and
needs NO exchange at all. Two build strategies measured:

  bhj: F.broadcast(scores) -- zero per-round exchanges, but the build
       side is |V_cust|-bounded, NOT broadcastable at 100 TB.
  shj: shuffle-hash hint -- build side stays partitioned (scale-safe),
       pays one |V|-row exchange per half-round, no |V|-row sort.

Run: python tools/probe_hits_r12.py {shipped|bhj|shj} [sf_dir]
Prints one JSON line {variant, best, runs, hash} (hash = md5 of the
collected sorted output rows, for bit-equality across variants).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from ushas_spark.durability import materialize, pin_partitioned
from ushas_spark.io import load_table
from ushas_spark.operators.graph import HITS_ITERS, HITS_SCALE
from ushas_spark.operators.graph import graph_hits_hub_authority


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )


def _finish(auths: DataFrame, hubs: DataFrame) -> DataFrame:
    from pyspark.sql import Window as W

    a_ranked = auths.select(
        F.lit("authority").alias("role"),
        F.col("supp").alias("node"),
        F.col("a").alias("score_x1e9"),
    )
    h_ranked = hubs.select(
        F.lit("hub").alias("role"),
        F.col("cust").alias("node"),
        F.col("h").alias("score_x1e9"),
    )
    w = W.partitionBy("role").orderBy(F.col("score_x1e9").desc(), "node")
    return (
        a_ranked.unionByName(h_ranked)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("role", "node", "score_x1e9", F.col("rnk").cast("long"))
        .orderBy("role", "rnk")
    )


def hits_probe(spark: SparkSession, sf_dir: str, build: str) -> DataFrame:
    """build = 'bhj' (broadcast scores) or 'shj' (shuffle-hash hint)."""
    base = _base(spark, sf_dir)
    # Pins swapped to the GROUPBY keys: the ar half streams pairs
    # partitioned by supp (its groupBy key), the hr half by cust.
    pairs_supp = pin_partitioned(base, "supp")
    pairs_cust = pin_partitioned(pairs_supp, "cust")

    def _build(df: DataFrame) -> DataFrame:
        if build == "bhj":
            return F.broadcast(df)
        if build == "shj":
            return df.hint("shuffle_hash")
        return df  # 'auto': let the planner pick from cached stats

    hubs = pairs_supp.select("cust").distinct().select(
        "cust", F.lit(HITS_SCALE).cast("long").alias("h")
    )
    auths = None
    for _ in range(HITS_ITERS):
        ar = materialize(
            pairs_supp.join(_build(hubs), "cust")
            .groupBy("supp")
            .agg(F.sum("h").alias("raw"))
        )
        amax = ar.agg(F.max("raw").alias("m"))
        auths = ar.crossJoin(F.broadcast(amax)).select(
            "supp",
            F.round(F.lit(float(HITS_SCALE)) * F.col("raw") / F.col("m"))
            .cast("long")
            .alias("a"),
        )
        hr = materialize(
            pairs_cust.join(_build(auths), "supp")
            .groupBy("cust")
            .agg(F.sum("a").alias("raw"))
        )
        hmax = hr.agg(F.max("raw").alias("m"))
        hubs = hr.crossJoin(F.broadcast(hmax)).select(
            "cust",
            F.round(F.lit(float(HITS_SCALE)) * F.col("raw") / F.col("m"))
            .cast("long")
            .alias("h"),
        )
    return _finish(auths, hubs)


def _release(spark: SparkSession) -> None:
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def main() -> None:
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> DataFrame:
        if variant == "shipped":
            return graph_hits_hub_authority(spark, sf_dir)
        if variant == "merge":
            # Force the merge regime (the pre-r12 shipped formulation).
            from ushas_spark.operators import graph as g

            g.HITS_BROADCAST_MAX_V = 0
            return graph_hits_hub_authority(spark, sf_dir)
        return hits_probe(spark, sf_dir, variant)

    rows = run().collect()
    digest = hashlib.md5(
        "\n".join(str(tuple(r)) for r in rows).encode()
    ).hexdigest()
    _release(spark)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run().write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        _release(spark)
    print(json.dumps({
        "variant": variant,
        "best": min(runs),
        "runs": runs,
        "hash": digest,
    }))


if __name__ == "__main__":
    main()
