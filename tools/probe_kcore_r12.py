"""r12 probe #5: folded broadcast-anti peel loop for k-core.

Shipped kcore_summary round (r11 adjacency shape): explode survivors'
arrays, LEFT SEMI against the survivor set (an E'-row exchange on the
neighbor id), re-collect arrays by node (a second E'-row exchange) --
2 E'-row exchanges per round, materialize() (localCheckpoint) loses the
groupBy's partitioning so the next round pays both again.

Probe (the CC-fold lesson transferred): (a) persist the adjacency WITH
its groupBy partitioning (InMemoryRelation preserves outputPartitioning;
LogicalRDD does not -- probe-verified r08), so explode/filter reads stay
w-partitioned; (b) subtract the DROPPED set (size(ns) < k, a free
re-scan of the same cache) via an explicit-broadcast LEFT ANTI join
instead of semi-joining survivors -- identical semantics (arrays are
symmetric, every neighbor is in exactly one of keep/dropped), but BHJ
preserves the stream's partitioning, so the re-collect groupBy(w)
finishes in place: a round plans ZERO exchanges. Dropped is |V'|-bounded
-- size-gate like CC_BROADCAST_MAX_V; past the gate the shipped loop
must run unchanged.

Run: python tools/probe_kcore_r12.py {shipped|fold} [sf_dir]
Prints {variant, best, runs, hash, round_shuffles}.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from ushas_spark import durability
from ushas_spark.durability import materialize, plan_counts
from ushas_spark.operators import graph
from ushas_spark.operators.graph import KCORE_K, KCORE_ROUNDS


def kcore_fold(
    edges: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> DataFrame:
    """Variant A (persist-chain, MEASURED NEGATIVE at sf0.01: 7.64 vs
    3.27 s best-of-3, hash-identical): persist() preserves the groupBy
    partitioning so every round planned ZERO exchanges, but persist does
    NOT truncate the logical plan, and each round references adj TWICE
    (stream + dropped) -- Catalyst re-inlines the chain exponentially
    across the 6 rounds (the r09 MMR lesson) and planning time swamps
    the exchanges saved.

    Variant B (this shape): keep materialize() (localCheckpoint,
    truncates, loses partitioning) and replace the survivor LEFT SEMI
    (E'-row exchange + sort on the stream, V'-row exchange + sort on the
    build) with an explicit-broadcast LEFT ANTI against the DROPPED set
    -- same semantics (arrays are symmetric; every neighbor is in
    exactly one of keep/dropped), one E'-row groupBy exchange per round
    instead of two exchanges + two sorts."""
    edges = materialize(edges)
    n_edges_initial = edges.agg(F.count(F.lit(1)).alias("n_edges_initial"))
    both = edges.select(F.col("u").alias("w"), F.col("v").alias("n")).unionAll(
        edges.select(F.col("v").alias("w"), F.col("u").alias("n"))
    )
    adj = materialize(both.groupBy("w").agg(F.collect_list("n").alias("ns")))
    n_nodes_initial = adj.agg(F.count(F.lit(1)).alias("n_nodes_initial"))

    round_shuffles = []
    surv = None
    for _ in range(rounds):
        surv = adj.filter(F.size("ns") >= k)
        dropped = adj.filter(F.size("ns") < k).select(F.col("w").alias("n"))
        new_adj = (
            surv.select("w", F.explode("ns").alias("n"))
            .join(F.broadcast(dropped), "n", "left_anti")
            .groupBy("w")
            .agg(F.collect_list("n").alias("ns"))
        )
        round_shuffles.append(
            plan_counts(new_adj._jdf.queryExecution().executedPlan())
        )
        adj = materialize(new_adj)

    summary = surv.agg(F.count(F.lit(1)).alias("n_core_nodes")).crossJoin(
        adj.agg(
            (F.coalesce(F.sum(F.size("ns")), F.lit(0)) / 2)
            .cast("long")
            .alias("n_core_edges"),
            F.min(F.size("ns")).cast("long").alias("min_core_degree"),
        )
    )
    return (
        n_nodes_initial.crossJoin(n_edges_initial)
        .crossJoin(summary)
        .select(
            F.lit(k).cast("long").alias("k"),
            "n_nodes_initial",
            "n_edges_initial",
            "n_core_nodes",
            "n_core_edges",
            "min_core_degree",
        )
    ), round_shuffles


def _release(spark: SparkSession) -> None:
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def build(spark: SparkSession, sf_dir: str, variant: str):
    from ushas_spark.io import load_table

    pl = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = pl.alias("a"), pl.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    if variant == "fold":
        return kcore_fold(edges)
    return graph.kcore_summary(edges), None


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
    df, round_shuffles = build(spark, sf_dir, variant)
    rows = df.collect()
    digest = hashlib.md5(
        "\n".join(str(tuple(r)) for r in rows).encode()
    ).hexdigest()
    _release(spark)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        d, _ = build(spark, sf_dir, variant)
        d.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        _release(spark)
    print(json.dumps({
        "variant": variant,
        "best": min(runs),
        "runs": runs,
        "hash": digest,
        "round_shuffles": round_shuffles,
    }))


if __name__ == "__main__":
    main()
