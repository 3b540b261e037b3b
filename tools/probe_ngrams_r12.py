"""r12 probe #8: remove provably-redundant distincts from the n-gram ops.

Two candidates, both guide §2.1 (remove shuffles outright) + §2.2
(shuffle fewer bytes), both with by-construction equivalence proofs:

- text_boilerplate_ngrams (boiler): pass 1 runs
  explode -> distinct(gram, doc) -> groupBy(gram). A (gram, doc)
  duplicate can only arise WITHIN one document (each doc is a single
  row before the explode), so explode(array_distinct(gram_array))
  yields the globally-distinct pair multiset by construction -- the
  full-width distinct exchange on gram strings disappears.

- pipeline_decontaminate (decon): grams are per-doc distinct already
  (array_distinct before explode) and the broadcast ev side is
  distinct on ng, so each (doc, ng) survives the inner join at most
  once: COUNT(DISTINCT ng) == COUNT(*) per doc. The plain count drops
  the distinct-aggregate's extra (doc_id, ng)-wide exchange.

Run: python tools/probe_ngrams_r12.py {boiler|decon}_{shipped|opt} [sf_dir]
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
from ushas_spark.operators.pipeline import _DECONTAM_EVAL_MOD
from ushas_spark.operators.text import BOILER_MIN_DOCS, BOILER_N


def boiler(spark: SparkSession, sf_dir: str, opt: bool) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    gram_array = F.expr(
        f"CASE WHEN size(split(text, ' ')) >= {BOILER_N} THEN"
        f" transform(sequence(1, size(split(text, ' ')) - {BOILER_N - 1}),"
        f" k -> concat_ws(' ', slice(split(text, ' '), k, {BOILER_N})))"
        f" ELSE CAST(array() AS array<string>) END"
    )
    grams = d.select("doc_id", F.explode(gram_array).alias("gram"))
    if opt:
        df_input = d.select(
            "doc_id", F.explode(F.array_distinct(gram_array)).alias("gram")
        )
    else:
        df_input = grams.select("gram", "doc_id").distinct()
    df_counts = df_input.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    boiler_set = df_counts.filter(
        F.col("n_docs") >= BOILER_MIN_DOCS
    ).select("gram")
    scored = grams.join(
        F.broadcast(boiler_set.withColumn("is_boiler", F.lit(1))),
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


def decon(spark: SparkSession, sf_dir: str, opt: bool) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    n = F.size(toks)
    ngs = F.when(
        n >= 3,
        F.array_distinct(
            F.zip_with(
                F.slice(toks, 1, n - 2),
                F.zip_with(
                    F.slice(toks, 2, n - 2),
                    F.slice(toks, 3, n - 2),
                    lambda b, c: F.concat_ws(" ", b, c),
                ),
                lambda a, bc: F.concat_ws(" ", a, bc),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    flat = d.select("doc_id", F.explode(ngs).alias("ng"))
    ev = (
        flat.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD == 0)
        .select("ng")
        .distinct()
    )
    tr = flat.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD != 0)
    agg = (
        F.count(F.lit(1)) if opt else F.count_distinct("ng")
    ).alias("n_shared_ngrams")
    return (
        tr.join(F.broadcast(ev), "ng")
        .groupBy("doc_id")
        .agg(agg)
        .orderBy("doc_id")
    )


def build(spark: SparkSession, sf_dir: str, variant: str) -> DataFrame:
    base, kind = variant.rsplit("_", 1)
    fn = {"boiler": boiler, "decon": decon}[base]
    return fn(spark, sf_dir, kind == "opt")


def main() -> None:
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ushas_spark.session import get_spark

    spark = get_spark("probe-ngrams-r12", cpus=32)
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
