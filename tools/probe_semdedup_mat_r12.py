"""r12 probe #10: materialize the embedding projection once in SemDeDup.

dedup_semantic_clusters runs its own inline Lloyd loop (it cannot call
kmeans_assign -- it needs the assignment WITH the raw vectors and norms
for the pair stage) and, unlike the r12-item-5 fix to kmeans_assign,
still re-derives `emb` (parquet scan + string->double-array conversion)
in every _assign call: ITERS round scans + the final assignment scan.
Candidate: the identical one-line transfer -- `emb = materialize(emb)`
before the loop. Pure repeated-scan/convert elimination; the float-op
sequence per row is untouched, so outputs are bit-identical by
construction (verified by hash anyway).

Run: python tools/probe_semdedup_mat_r12.py {shipped|mat} [sf_dir]
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
    SEMDEDUP_TAU_X1M,
    _assign,
    _dvec,
    _init_centroids,
    _update,
)


def semdedup_mat(spark: SparkSession, sf_dir: str):
    from ushas_spark.operators.similarity import dot

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    emb = materialize(emb)
    cents = _init_centroids(emb)
    for _ in range(ITERS):
        cents = materialize(_update(_assign(emb, cents)))
    assigned = materialize(
        _assign(emb, cents).select(
            "vec_id",
            "e",
            F.col("cid"),
            F.sqrt(dot(F.col("e"), F.col("e"))).alias("nrm"),
        )
    )
    other = assigned.select(
        F.col("cid").alias("cid_b"),
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("e_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = (
        assigned.join(
            other,
            (F.col("cid") == F.col("cid_b")) & (F.col("vec_id") < F.col("id_b")),
        )
        .select(
            "cid",
            F.col("vec_id").alias("id_a"),
            "id_b",
            F.round(
                dot(F.col("e"), F.col("e_b"))
                / (F.col("nrm") * F.col("nrm_b"))
                * 1_000_000
            )
            .cast("long")
            .alias("sim_x1m"),
        )
    )
    pairs = materialize(pairs)
    members = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    drops = (
        pairs.filter(F.col("sim_x1m") >= SEMDEDUP_TAU_X1M)
        .select("cid", "id_b")
        .distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    sims = pairs.groupBy("cid").agg(F.max("sim_x1m").alias("max_sim_x1m"))
    return (
        members.join(drops, "cid", "left")
        .join(sims, "cid", "left")
        .select(
            F.col("cid").alias("cluster"),
            "n_members",
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias("n_dropped"),
            (
                F.col("n_members") - F.coalesce(F.col("n_dropped"), F.lit(0))
            ).cast("long").alias("n_kept"),
            F.coalesce(F.col("max_sim_x1m"), F.lit(0)).cast("long").alias("max_sim_x1m"),
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
        semdedup_mat
        if variant == "mat"
        else clustering.dedup_semantic_clusters
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
