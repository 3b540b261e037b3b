"""r12 probe #6: materialize the embedding projection once across Lloyd rounds.

Shipped kmeans_assign re-derives `emb` (parquet scan + string->double
array conversion) in every _assign call: ITERS round scans + the final
assignment scan. Each scan is exchange-free (the centroid fold is a
1-row broadcast), so the candidate win is pure repeated-scan/convert
elimination, the Hilbert lesson's weaker cousin. Probe: localCheckpoint
`emb` once (corpus-sized but column-pruned: vec_id + double array); all
rounds then read the materialized blocks.

Run: python tools/probe_kmeans_r12.py {shipped|mat} [sf_dir]
Prints {variant, best, runs, hash}.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from ushas_spark.durability import materialize
from ushas_spark.io import load_table
from ushas_spark.operators import clustering
from ushas_spark.operators.clustering import (
    ITERS,
    K,
    _assign,
    _dvec,
    _init_centroids,
    _update,
)


def kmeans_stats_mat(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    emb = materialize(emb)
    cents = _init_centroids(emb, K)
    for _ in range(ITERS):
        cents = materialize(_update(_assign(emb, cents)))
    a = _assign(emb, cents).select(
        "vec_id", F.col("cid").alias("cluster"), F.col("ds").alias("dist_x1m")
    )
    return (
        a.groupBy(F.col("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist_x1m").alias("sum_dist_x1m"),
            F.min("vec_id").alias("exemplar_id"),
        )
        .orderBy("cluster")
    )


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
    fn = (
        kmeans_stats_mat
        if variant == "mat"
        else clustering.cluster_kmeans_stats
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
        "best": min(runs),
        "runs": runs,
        "hash": digest,
    }))


if __name__ == "__main__":
    main()
