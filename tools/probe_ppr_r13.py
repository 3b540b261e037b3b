"""r13 probe #2: graph_personalized_pagerank (VERDICT r12 item 5).

The r12 broadcast-regime transfer measured NEGATIVE for PPR because the
per-round seed left-join + crossJoin rescale nested inside each round's
broadcast child. Two ways out, probed here:

- pred: the seed membership test is PROVABLY the predicate
  ``node < PPR_SEED_CAP``: seeds is defined as exactly the V-nodes
  below the cap, every aggregated node is in V (dst values of the
  symmetric edge list), so ``sd.node IS NOT NULL`` in the oracle's
  left join ⟺ ``node < CAP``. The per-round broadcast seed join (and
  r0's) collapses to a WHEN expression -- ITERS+1 joins removed from
  the plan in ANY regime. The 1-row n_seeds crossJoin stays (the seed
  count is data-derived).
- predb: pred + the r12 pagerank broadcast-regime transfer (edges
  pinned on DST = the groupBy key, ranks explicitly broadcast per
  round). With the seed join gone, the broadcast child is the same
  tiny rescale projection that won for global PageRank.
- hoist: the verdict's literal suggestion -- broadcast regime with the
  per-round aggregate MATERIALIZED first, the (join-based) rescale
  applied to the checkpointed |V|-row table outside the broadcast
  child. Kept as the comparison arm in case the predicate rewrite were
  ever rejected.

Run: python tools/probe_ppr_r13.py {shipped|pred|predb|hoist} [sf_dir]
Prints {variant, best, runs, hash}.
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
from ushas_spark.operators.graph import (
    DAMPING,
    ITERS,
    PPR_SEED_CAP,
    RANK_SCALE,
    TOP_N,
    _edges,
    graph_personalized_pagerank,
)


def _finish(ranks: DataFrame) -> DataFrame:
    return (
        ranks.select(
            "node",
            F.round(F.col("rank") * RANK_SCALE).cast("long").alias("rank_x1e9"),
            F.when(F.col("node") >= 1_000_000_000, "supplier")
            .otherwise("customer")
            .alias("node_type"),
        )
        .filter(F.col("rank_x1e9") > 0)
        .orderBy(F.col("rank_x1e9").desc(), "node")
        .limit(TOP_N)
    )


def _ppr_pred(
    spark: SparkSession, sf_dir: str, bcast: bool, hoist_mat: bool = False
) -> DataFrame:
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ewd = pin_partitioned(edges.join(deg, "src"), "dst" if bcast else "src")
    nodes = ewd.groupBy("src").agg(F.first("deg")).select(
        F.col("src").alias("node")
    )
    n_seeds = materialize(
        nodes.filter(F.col("node") < PPR_SEED_CAP).agg(
            F.count(F.lit(1)).alias("ns")
        )
    )
    is_seed = F.col("node") < PPR_SEED_CAP
    ranks = nodes.crossJoin(F.broadcast(n_seeds)).select(
        "node",
        F.when(is_seed, F.lit(1.0) / F.col("ns").cast("double"))
        .otherwise(0.0)
        .alias("rank"),
        "ns",
    )
    for _ in range(ITERS):
        r = ranks.hint("broadcast") if bcast else ranks
        contrib = r.join(ewd, r.node == ewd.src).select(
            F.col("dst").alias("node"),
            F.round((F.col("rank") / F.col("deg").cast("double")) * RANK_SCALE)
            .cast("long")
            .alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        if hoist_mat:
            summed = materialize(summed)
        ranks = summed.crossJoin(F.broadcast(n_seeds)).select(
            "node",
            (
                F.when(
                    is_seed, F.lit(1.0 - DAMPING) / F.col("ns").cast("double")
                ).otherwise(0.0)
                + F.lit(DAMPING)
                * (F.col("sc").cast("double") / F.lit(float(RANK_SCALE)))
            ).alias("rank"),
            "ns",
        )
    return _finish(ranks)


def ppr_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ppr_pred(spark, sf_dir, bcast=False)


def ppr_predb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ppr_pred(spark, sf_dir, bcast=True)


def ppr_hoist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verdict's literal arm: broadcast regime, JOIN-based rescale, but
    the round aggregate materialized so the rescale sits on a
    checkpointed |V|-row table outside the broadcast child."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ewd = pin_partitioned(edges.join(deg, "src"), "dst")
    nodes = ewd.groupBy("src").agg(F.first("deg")).select(
        F.col("src").alias("node")
    )
    seeds = nodes.filter(F.col("node") < PPR_SEED_CAP).select(
        F.col("node").alias("seed")
    )
    n_seeds = materialize(seeds.agg(F.count(F.lit(1)).alias("ns")))
    is_seed = F.col("seed").isNotNull()
    ranks = (
        nodes.join(F.broadcast(seeds), nodes.node == seeds.seed, "left")
        .crossJoin(F.broadcast(n_seeds))
        .select(
            "node",
            F.when(is_seed, F.lit(1.0) / F.col("ns").cast("double"))
            .otherwise(0.0)
            .alias("rank"),
            "ns",
        )
    )
    for _ in range(ITERS):
        contrib = ranks.hint("broadcast").join(ewd, ranks.node == ewd.src).select(
            F.col("dst").alias("node"),
            F.round((F.col("rank") / F.col("deg").cast("double")) * RANK_SCALE)
            .cast("long")
            .alias("c"),
        )
        summed = materialize(contrib.groupBy("node").agg(F.sum("c").alias("sc")))
        ranks = (
            summed.join(F.broadcast(seeds), summed.node == seeds.seed, "left")
            .crossJoin(F.broadcast(n_seeds))
            .select(
                "node",
                (
                    F.when(
                        is_seed,
                        F.lit(1.0 - DAMPING) / F.col("ns").cast("double"),
                    ).otherwise(0.0)
                    + F.lit(DAMPING)
                    * (F.col("sc").cast("double") / F.lit(float(RANK_SCALE)))
                ).alias("rank"),
                "ns",
            )
        )
    return _finish(ranks)


VARIANTS = {
    "shipped": graph_personalized_pagerank,
    "pred": ppr_pred,
    "predb": ppr_predb,
    "hoist": ppr_hoist,
}


def _release(spark: SparkSession) -> None:
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in VARIANTS:
        print(f"Run: python {sys.argv[0]} {{{'|'.join(VARIANTS)}}} [sf_dir]")
        raise SystemExit(2)
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
    fn = VARIANTS[variant]
    rows = fn(spark, sf_dir).collect()
    digest = hashlib.md5(
        "\n".join(str(tuple(r)) for r in rows).encode()
    ).hexdigest()
    _release(spark)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
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
