"""r12 probe #3: broadcast-regime + self-loop fold for label-prop CC.

Shipped connected_components round: labels (|V'|-row, localCheckpointed)
exchanges+sorts into an SMJ against the s-pinned symmetrized edges,
then self_rows UNION nbr_rows feed a groupBy(id) min that pays another
exchange (the union kills partitioning). Probe: (a) bake SELF-LOOP rows
(s=d, own=true) into the pinned edge list once, so the per-round union
disappears -- one join emits both neighbor and self rows; (b) pin the
edges on D (the groupBy key) and broadcast the labels side explicitly,
so the BHJ output stays d-partitioned and the groupBy finishes in
place: a round plans zero exchanges.

Run: python tools/probe_cc_r12.py {shipped|bcast} {inc|cluster} [sf_dir]
(inc = graph_components_incremental, cluster = dedup_cluster_components)
Prints {variant, query, best, runs, hash}.
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
from ushas_spark.operators import dedup, graph


def cc_bcast(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """Broadcast-regime hash-min label propagation with self-loops."""
    directed = materialize(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    )
    sym = directed.union(
        directed.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    edge_nodes = sym.select(F.col("s").alias("id")).distinct()
    # Self-loops folded into the pinned relation: one join per round
    # emits both the neighbor rows (own=false) and the node's own label
    # row (own=true) -- no per-round union, no second input to the agg.
    withloops = sym.select("s", "d", F.lit(False).alias("own")).union(
        edge_nodes.select(
            F.col("id").alias("s"), F.col("id").alias("d"),
            F.lit(True).alias("own"),
        )
    )
    pinned = pin_partitioned(withloops, "d")
    if init_labels is None:
        labels = materialize(edge_nodes.withColumn("label", F.col("id")))
    else:
        seeds = init_labels.select(
            F.col(init_labels.columns[0]).alias("sid"),
            F.col(init_labels.columns[1]).alias("slabel"),
        )
        labels = materialize(
            edge_nodes.join(seeds, edge_nodes.id == seeds.sid, "left").select(
                "id", F.coalesce("slabel", F.col("id")).alias("label")
            )
        )
    for _ in range(max_iter):
        lb = labels.hint("broadcast")
        new_labels = (
            pinned.join(lb, pinned.s == lb.id)
            .groupBy(F.col("d").alias("id2"))
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("own"), F.col("label"))).alias("_old"),
            )
            .select(
                F.col("id2").alias("id"),
                "label",
                (F.col("label") < F.col("_old")).alias("_chg"),
            )
        )
        new_labels = materialize(new_labels)
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    all_nodes = nodes.select(F.col(id_col).alias("id"))
    return all_nodes.join(labels, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("label")
    )


def _release(spark: SparkSession) -> None:
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def main() -> None:
    variant, which = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if variant == "bcast":
        dedup.connected_components = cc_bcast
        graph_mod_cc = sys.modules.get("ushas_spark.operators.graph")
        # graph_components_incremental imports connected_components
        # inside the function body from dedup, so the patch above covers
        # both call sites.
    fn = (
        graph.graph_components_incremental
        if which == "inc"
        else dedup.dedup_cluster_components
    )
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
        "query": which,
        "best": min(runs),
        "runs": runs,
        "hash": digest,
    }))


if __name__ == "__main__":
    main()
