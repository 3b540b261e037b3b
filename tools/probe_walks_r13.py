"""r13 probe #1: graph_random_walks hop restructures (VERDICT r12 item 4).

Shipped shape (r10, "floor" in OPTIMIZATION_r12): per hop, the walk
table BHJ-joins the src-pinned edge table (full |E|-row in-memory scan
per hop), md5 is evaluated per candidate edge, and a groupBy(walker)
argmin exchanges ~|walkers| rows post-partial-agg while dragging every
prefix column through F.first() aggregates.

Variants probed here:

- nodist: shipped minus the ``.distinct()`` on ``_edges`` -- provably
  redundant (``_edges`` dedups the (cust, supp) pair set and the
  fwd/rev halves live in disjoint id ranges, so the union is distinct
  by construction; same argument class as the r12 boilerplate distinct
  removal). One full-|E| exchange less before the pin.
- adj: adjacency-array formulation. The pinned |E|-row edge table
  becomes a materialized |V|-row (src, nbrs array) table (groupBy on
  the already-src-pinned edges plans zero extra exchanges); each hop is
  ONE join walks⋈adj on the current node plus an IN-ROW argmin
  ``array_min(transform(nbrs, d -> struct(md5(...), d)))`` -- the
  md5-per-candidate count is identical (the oracle's semantics), but
  the per-hop |E|-scan, the candidate explosion through the join, the
  groupBy(walker) exchange and the F.first prefix-carrying all
  disappear. Per-hop scan volume drops from |E| rows to |V| rows.
  Dodges the probe-#12 in-row failure mode: no map_contains_key linear
  scan (the fold is O(deg) with O(1) per-element work, exactly like the
  exploded shape) -- the risk probed here is HOF interpretation
  overhead vs codegen'd explode+hash-agg.
- adjb: adj + explicit broadcast of the walk table per hop (size-gated
  at ship time like HITS/PAGERANK_BROADCAST_MAX_V; |walkers| is linear
  in customers).

Run: python tools/probe_walks_r13.py {shipped|nodist|adj|adjb} [sf_dir]
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
    START_MOD,
    WALK_LEN,
    _edges,
    graph_random_walks,
)


def walks_nodist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipped shape minus the provably-redundant edges.distinct()."""
    edges = pin_partitioned(_edges(spark, sf_dir), "src")
    starts = (
        edges.select(F.col("src").alias("n0"))
        .where((F.col("n0") < 1_000_000_000) & (F.col("n0") % START_MOD == 0))
        .distinct()
    )
    walks = starts.withColumn("walker", F.col("n0"))
    cur = "n0"
    for t in range(1, WALK_LEN + 1):
        hop = walks.join(edges, walks[cur] == edges.src).withColumn(
            "h",
            F.md5(F.concat_ws("|", F.col("walker"), F.lit(t), F.col("dst"))),
        )
        keep = [F.first(c).alias(c) for c in walks.columns if c != "walker"]
        walks = (
            hop.groupBy("walker")
            .agg(*keep, F.min(F.struct("h", "dst")).alias("m"))
            .select(*[c for c in walks.columns], F.col("m.dst").alias(f"n{t}"))
        )
        cur = f"n{t}"
    return walks.drop("walker").orderBy("n0")


def _walks_adj(
    spark: SparkSession, sf_dir: str, bcast_walks: bool
) -> DataFrame:
    # No pin: edges feed exactly ONE consumer now (the adjacency build),
    # so the groupBy's own exchange does the partitioning work and the
    # result is checkpointed for the hops. (Shipped pins because the
    # |E| table is joined once per hop.)
    adj = materialize(
        _edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
    )
    walks = adj.select(F.col("src").alias("n0")).where(
        (F.col("n0") < 1_000_000_000) & (F.col("n0") % START_MOD == 0)
    )
    cur = "n0"
    for t in range(1, WALK_LEN + 1):
        w = walks.hint("broadcast") if bcast_walks else walks
        argmin = F.array_min(
            F.transform(
                F.col("nbrs"),
                lambda d: F.struct(
                    F.md5(
                        F.concat_ws("|", F.col("n0"), F.lit(t), d)
                    ).alias("h"),
                    d.alias("dst"),
                ),
            )
        )
        walks = w.join(adj, w[cur] == adj.src).select(
            *[w[c] for c in walks.columns], argmin["dst"].alias(f"n{t}")
        )
        cur = f"n{t}"
    return walks.orderBy("n0")


def walks_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _walks_adj(spark, sf_dir, bcast_walks=False)


def walks_adjb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _walks_adj(spark, sf_dir, bcast_walks=True)


VARIANTS = {
    "shipped": graph_random_walks,
    "nodist": walks_nodist,
    "adj": walks_adj,
    "adjb": walks_adjb,
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
