"""r12 probe #7: broadcast-regime closing joins for triangle counting.

Shipped triangle_summary (r10 adjacency-intersection shape): the degree
joins exchange the E-row edge list twice (u then v, SMJ), and the
closing `es JOIN adj_t ON t` exchanges E rows EACH CARRYING an
O(sqrt(m)) neighbor array -- by bytes the heaviest shuffle in the
query. But du/dv are |V|-row two-column tables and adj_t holds E total
array entries (~10 MB at sf0.1), all broadcastable at gate scales.

Probe: explicit F.broadcast on du, dv and adj_t. The degree orientation
becomes map-side, and the closing intersection probes a broadcast hash
table while es stays on the s-pinned cache -- zero exchanges past the
deg build + pin. Size-gate (TRIANGLE_BROADCAST_MAX_E over the
just-materialized edge count) for the 100 TB regime where E grows with
the corpus; past it the shipped shape must run byte-unchanged.

Run: python tools/probe_triangle_r12.py {shipped|bcast} [sf_dir]
Prints {variant, best, runs, hash, counts}.
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
from ushas_spark.durability import materialize, pin_partitioned
from ushas_spark.io import load_table
from ushas_spark.operators import graph


def triangle_bcast(edges: DataFrame, bcast_es: bool = False) -> DataFrame:
    edges = materialize(edges)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    keyed = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    lower = F.struct("du", "u") < F.struct("dv", "v")
    oriented = keyed.select(
        F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    oriented = pin_partitioned(oriented, "s")
    adj = oriented.groupBy("s").agg(F.collect_list("t").alias("nbrs"))
    es = oriented.join(F.broadcast(adj) if bcast_es else adj, "s").select(
        "t", F.col("nbrs").alias("ns")
    )
    adj_t = adj.select(F.col("s").alias("t"), F.col("nbrs").alias("nt"))
    tri = (
        es.join(F.broadcast(adj_t), "t")
        .select(F.size(F.array_intersect("ns", "nt")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))
    )
    totals = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        totals.crossJoin(n_edges)
        .crossJoin(tri)
        .select("n_vertices", "n_edges", "n_wedges", "n_triangles")
    )


def _release(spark: SparkSession) -> None:
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def build(spark: SparkSession, sf_dir: str, variant: str) -> DataFrame:
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
    if variant == "bcast":
        return triangle_bcast(edges)
    if variant == "bcast2":
        return triangle_bcast(edges, bcast_es=True)
    return graph.triangle_summary(edges)


def main() -> None:
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ushas_spark.session import get_spark

    spark = get_spark("probe-triangle-r12", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    durability.begin_plan_audit()
    df = build(spark, sf_dir, variant)
    rows = df.collect()
    segs = durability.end_plan_audit()
    counts = {}
    for s in segs:
        for k, v in s["counts"].items():
            counts[k] = counts.get(k, 0) + v
    digest = hashlib.md5(
        "\n".join(str(tuple(r)) for r in rows).encode()
    ).hexdigest()
    _release(spark)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        build(spark, sf_dir, variant).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        _release(spark)
    print(json.dumps({
        "variant": variant,
        "best": min(runs),
        "runs": runs,
        "hash": digest,
        "segment_counts": counts,
    }))


if __name__ == "__main__":
    main()
