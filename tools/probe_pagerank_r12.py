"""r12 probe #2: transfer the HITS broadcast-regime lesson to PageRank.

Shipped pagerank()/graph_personalized_pagerank() loops: per round, the
|V|-row ranks table joins the src-pinned edge table (ranks side pays a
|V|-row exchange + sort) and the contribution groupBy(dst) pays one
|V|-bounded post-partial-agg exchange. HITS showed both disappear when
the edge pins sit on the GROUPBY key and the score side is an EXPLICIT
broadcast (unhinted BHJ keeps the planned exchanges as stage
boundaries).

Differences from HITS probed here: pagerank does NOT materialize per
round -- the 3-round plan nests broadcasts 3 deep inside one job -- and
nodes/degree derivation pays one extra exchange when the pin moves off
src.

Run: python tools/probe_pagerank_r12.py {shipped|bcast|pshipped|pbcast} [sf_dir]
(p* = personalized variant.) Prints {variant, best, runs, hash}.
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
    graph_pagerank_top,
)


def pagerank_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-regime global PageRank: edges pinned by dst, ranks
    side explicitly broadcast each round."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ewd = pin_partitioned(edges.join(deg, "src"), "dst")
    nodes = ewd.groupBy("src").agg(F.first("deg")).select(
        F.col("src").alias("node")
    )
    n_nodes = materialize(nodes.agg(F.count(F.lit(1)).alias("n")))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n").cast("double")).alias("rank"), "n"
    )
    for _ in range(ITERS):
        r = ranks.hint("broadcast")
        contrib = r.join(ewd, r.node == ewd.src).select(
            F.col("dst").alias("node"),
            F.round((F.col("rank") / F.col("deg").cast("double")) * RANK_SCALE)
            .cast("long")
            .alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        ranks = summed.crossJoin(F.broadcast(n_nodes)).select(
            "node",
            (
                F.lit(1.0 - DAMPING) / F.col("n").cast("double")
                + F.lit(DAMPING)
                * (F.col("sc").cast("double") / F.lit(float(RANK_SCALE)))
            ).alias("rank"),
            "n",
        )
    pr = ranks.select(
        "node", F.round(F.col("rank") * RANK_SCALE).cast("long").alias("rank_x1e9")
    )
    return pr.select(
        "node",
        "rank_x1e9",
        F.when(F.col("node") >= 1_000_000_000, F.lit("supplier"))
        .otherwise(F.lit("customer"))
        .alias("node_type"),
    ).orderBy(F.col("rank_x1e9").desc(), "node").limit(TOP_N)


def ppr_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-regime personalized PageRank (same transfer)."""
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
        r = ranks.hint("broadcast")
        contrib = r.join(ewd, r.node == ewd.src).select(
            F.col("dst").alias("node"),
            F.round(
                (F.col("rank") / F.col("deg").cast("double")) * RANK_SCALE
            )
            .cast("long")
            .alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        ranks = (
            summed.join(
                F.broadcast(seeds), summed.node == seeds.seed, "left"
            )
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
    return (
        ranks.select(
            "node",
            F.round(F.col("rank") * RANK_SCALE).cast("long").alias(
                "rank_x1e9"
            ),
            F.when(F.col("node") >= 1_000_000_000, "supplier")
            .otherwise("customer")
            .alias("node_type"),
        )
        .filter(F.col("rank_x1e9") > 0)
        .orderBy(F.col("rank_x1e9").desc(), "node")
        .limit(TOP_N)
    )


def _merge_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Force the merge regime (the pre-r12 shipped formulation).
    from ushas_spark.operators import graph as g

    g.PAGERANK_BROADCAST_MAX_V = 0
    return graph_pagerank_top(spark, sf_dir)


VARIANTS = {
    "shipped": graph_pagerank_top,
    "merge": _merge_regime,
    "bcast": pagerank_bcast,
    "pshipped": graph_personalized_pagerank,
    "pbcast": ppr_bcast,
}


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
