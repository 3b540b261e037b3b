"""r12 probe #11: one-pass Arrow moment matrix for sim_pca_power_iteration.

Shipped shape scans the quantised corpus THREE times (pairs explode for
the second-moment cells, posexplode for the per-dim means, count for n)
and the heavy one fans out 2080 named_structs per row through an
explode + hash aggregate (~31M struct rows at sf0.1). All three
readouts are exact-integer sums, i.e. order-independent and
partial-aggregatable, so one mapInPandas pass can emit per-batch
partial G = X^T X (upper triangle), per-dim sums, and the row count as
~2145 tiny rows per batch -- one corpus scan, no struct fan-out, the
shuffle stays O(D^2) per map partition exactly like the shipped
combine. numpy int64 matmul is exact integer arithmetic (the operator's
documented BIGINT overflow budget applies unchanged; numpy would wrap
where ANSI throws, but both sit ~300x inside the bound at tested
scales), so outputs are bit-identical by construction.

The power-iteration rounds (broadcast 64-row vector vs the materialized
4096-cell matrix) are byte-identical to shipped.

Run: python tools/probe_pca_r12.py {shipped|arrow} [sf_dir]
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
    PCA_DIM,
    PCA_ROUNDS,
    PCA_SCALE,
    _dvec,
)


def pca_arrow(spark: SparkSession, sf_dir: str):
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    xs = F.transform(
        _dvec(F.col("embedding")),
        lambda v: F.round(v * PCA_SCALE).cast("long"),
    )
    rows = emb.select(xs.alias("xs"))

    D = PCA_DIM

    def moments(batches):
        iu, ju = np.triu_indices(D)
        G = np.zeros((D, D), dtype=np.int64)
        m = np.zeros(D, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["xs"].tolist(), dtype=np.int64)
            G += X.T @ X
            m += X.sum(axis=0)
            n += len(X)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(D), [-1]]),
                "j": np.concatenate([ju, np.full(D, -1), [-1]]),
                "p": np.concatenate([G[iu, ju], m, [n]]),
            }
        )

    part = rows.mapInPandas(moments, "i long, j long, p long")
    agg = materialize(
        part.groupBy("i", "j").agg(F.sum("p").alias("s"))
    )  # <= 2145 rows: 2080 cells + 64 means + 1 count
    upper = agg.filter((F.col("i") >= 0) & (F.col("j") >= 0))
    cells = upper.unionAll(
        upper.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("s")
        )
    )
    mu = agg.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        "i", F.col("s").alias("m")
    )
    nn = agg.filter(F.col("i") == -1).select(F.col("s").alias("n"))
    c = (
        cells.join(F.broadcast(mu.select(F.col("i"), F.col("m").alias("mi"))), "i")
        .join(
            F.broadcast(mu.select(F.col("i").alias("j"), F.col("m").alias("mj"))),
            "j",
        )
        .crossJoin(F.broadcast(nn))
        .select("i", "j", (F.col("n") * F.col("s") - F.col("mi") * F.col("mj")).alias("c"))
    )
    c = materialize(c)

    v = None
    u = None
    for _ in range(PCA_ROUNDS):
        if v is None:
            u = c.groupBy("i").agg(F.sum(F.col("c") * 1000).alias("u"))
        else:
            vj = F.broadcast(v.select(F.col("i").alias("j"), F.col("v").alias("vj")))
            u = c.join(vj, "j").groupBy("i").agg(F.sum(F.col("c") * F.col("vj")).alias("u"))
        u = materialize(u)
        d = u.agg(
            F.greatest(F.expr("max(abs(u)) div 1000"), F.lit(1)).alias("d")
        )
        v = u.crossJoin(F.broadcast(d)).select(
            "i",
            (
                F.when(F.col("u") < 0, -1).otherwise(1)
                * F.expr("abs(u) div d")
            ).alias("v"),
        )
    lam = u.agg(F.expr("max(abs(u)) div 1000").alias("eigenvalue_est"))
    return (
        v.crossJoin(F.broadcast(lam))
        .select(
            F.col("i").cast("long").alias("dim"),
            F.col("v").cast("long").alias("loading_q"),
            F.col("eigenvalue_est").cast("long"),
        )
        .orderBy("dim")
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
    fn = pca_arrow if variant == "arrow" else clustering.sim_pca_power_iteration
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
