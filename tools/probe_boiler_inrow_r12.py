"""r12 probe #12: in-row boilerplate scoring for text_boilerplate_ngrams.

Guide §2.4 (remove shuffles outright) + §2.3 (shuffle fewer bytes): the
shipped pass 2 explodes EVERY gram occurrence (full multiplicity) into a
row stream, probes a broadcast boiler set per row, and re-aggregates by
doc_id -- but every exploded row of one document comes from ONE input
row, so the per-doc rollup is row-local by construction:

    n_grams  = size(gram_array)
    n_boiler = aggregate(gram_array, 0L,
                         (acc, g) -> acc + IF(boiler contains g, 1, 0))

The candidate ships the boiler set as a one-row broadcast map
(map_from_entries over the already-tiny high-doc-frequency tail; the
same size bound as the shipped broadcast join) and computes both counts
in-row: the scoring explode disappears, the groupBy(doc_id) exchange
disappears, and no gram-occurrence row stream is ever materialized.
Docs whose gram array is empty emit no explode rows in the shipped
shape, hence the size(ga) > 0 filter.

Equivalence: boiler_set is distinct on gram (it is a groupBy output),
so the shipped left join cannot duplicate occurrences; per doc,
count(1) over exploded rows == size(ga) and sum(is_boiler) ==
the membership count over ga. Caution precedent: probe #9's in-row
bloom rewrite measured a LOSS (per-gram xxhash re-evaluation); here the
per-gram work is one broadcast-map probe, which the shipped BHJ also
pays per exploded row -- ship only on a pairing win.

OUTCOME (session 5): NOT shipped -- hash-identical at sf0.01 but a
decisive sf0.1 LOSS (shipped best-of-3 4.95 s; candidate DNF past a
10-minute bound in the same window). Spark's ArrayBasedMapData has no
hash index: map_contains_key is a linear scan over the boiler set per
gram occurrence (O(G x B)), and the HOF fold is CodegenFallback; the
shipped BHJ probes a real hash relation. Adjudicated in
ushas_spark/registry.py (NEGATIVE r12 probe #12).

Run: python tools/probe_boiler_inrow_r12.py {shipped|inrow} [sf_dir]
Prints {variant, best, runs, hash, plan_counts}.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from ushas_spark.durability import plan_counts
from ushas_spark.io import load_table
from ushas_spark.operators.text import BOILER_MIN_DOCS, BOILER_N


def _gram_array():
    return F.expr(
        f"CASE WHEN size(split(text, ' ')) >= {BOILER_N} THEN"
        f" transform(sequence(1, size(split(text, ' ')) - {BOILER_N - 1}),"
        f" k -> concat_ws(' ', slice(split(text, ' '), k, {BOILER_N})))"
        f" ELSE CAST(array() AS array<string>) END"
    )


def _boiler_set(d: DataFrame) -> DataFrame:
    df_counts = (
        d.select(F.explode(F.array_distinct(_gram_array())).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return df_counts.filter(F.col("n_docs") >= BOILER_MIN_DOCS).select("gram")


def shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    grams = d.select("doc_id", F.explode(_gram_array()).alias("gram"))
    scored = grams.join(
        F.broadcast(_boiler_set(d).withColumn("is_boiler", F.lit(1))),
        "gram",
        "left",
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boiler"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long"),
            F.col("n_boiler").cast("long"),
            F.expr("1000 * n_boiler div n_grams").alias("boiler_x1000"),
        )
        .orderBy("doc_id")
    )


def inrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bm = _boiler_set(d).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("gram"), F.lit(1)))
        ).alias("bm")
    )
    scored = (
        d.select("doc_id", _gram_array().alias("ga"))
        .filter(F.size("ga") > 0)
        .crossJoin(F.broadcast(bm))
    )
    return (
        scored.select(
            "doc_id",
            F.size("ga").cast("long").alias("n_grams"),
            F.expr(
                "aggregate(ga, 0L, (acc, g) ->"
                " acc + IF(map_contains_key(bm, g), 1L, 0L))"
            ).alias("n_boiler"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long"),
            F.col("n_boiler").cast("long"),
            F.expr("1000 * n_boiler div n_grams").alias("boiler_x1000"),
        )
        .orderBy("doc_id")
    )


def build(spark: SparkSession, sf_dir: str, variant: str) -> DataFrame:
    return {"shipped": shipped, "inrow": inrow}[variant](spark, sf_dir)


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("shipped", "inrow"):
        print(f"Run: python {sys.argv[0]} {{shipped|inrow}} [sf_dir]")
        raise SystemExit(2)
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ushas_spark.session import get_spark

    spark = get_spark("probe-boiler-inrow-r12", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = build(spark, sf_dir, variant)
    counts = plan_counts(df._jdf.queryExecution().executedPlan())
    rows = df.collect()
    digest = hashlib.md5(
        "\n".join(str(tuple(r)) for r in rows).encode()
    ).hexdigest()
    spark.catalog.clearCache()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        build(spark, sf_dir, variant).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "variant": variant,
                "best": min(runs),
                "runs": runs,
                "n_rows": len(rows),
                "hash": digest,
                "plan_counts": counts,
            }
        )
    )


if __name__ == "__main__":
    main()
