"""r12 probe #9: pipeline_bloom_prefilter shuffle removals.

Variants (cumulative, each provably value-identical):

- shipped: current formulation.
- nodist:  drop ``bits.distinct()`` -- BIT_OR is idempotent, so folding
  the bit multiset equals folding its support set [guide §2.1]. Removes
  the full eval-bit-stream exchange.
- inrow:   nodist + compute the probe IN-ROW: the <=65-row word table
  folds into a ONE-ROW map (word -> mask) via map-side-combinable
  map_from_entries(collect_list), crossJoin-broadcast onto the train
  grams, and hit = forall over the BLOOM_HASHES positions with
  element_at -- the per-bit explode (H rows/gram), the per-bit BHJ and
  the (doc_id, ng)-wide min-agg exchange all disappear; the final
  rollup reads the gram stream map-side [guide §2.1, §2.2].

Run: python tools/probe_bloom_r12.py {shipped|nodist|inrow} [sf_dir]
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
from ushas_spark.operators.dedup import hash60
from ushas_spark.operators.pipeline import (
    BLOOM_BITS,
    BLOOM_HASHES,
    _DECONTAM_EVAL_MOD,
)


def bloom_variant(spark: SparkSession, sf_dir: str, variant: str) -> DataFrame:
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
    hashed = d.select("doc_id", F.explode(ngs).alias("ng")).select(
        "doc_id",
        "ng",
        (hash60(F.col("ng")) % BLOOM_BITS).alias("h1"),
        (
            F.lit(1)
            + hash60(F.concat(F.col("ng"), F.lit("|"))) % (BLOOM_BITS - 1)
        ).alias("h2"),
    )
    ev = hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD == 0)
    bits = ev.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(BLOOM_HASHES - 1)),
                lambda i: (F.col("h1") + i * F.col("h2")) % BLOOM_BITS,
            )
        ).alias("bit")
    )
    if variant == "shipped":
        bits = bits.distinct()
    words = bits.groupBy(F.expr("bit div 62").alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))")
        ).alias("mask")
    )
    tr = hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD != 0)
    if variant == "inrow":
        wordmap = words.agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "mask"))
            ).alias("wm")
        )
        hit_expr = F.expr(
            f"forall(sequence(0, {BLOOM_HASHES - 1}), i -> ("
            f"  coalesce(element_at(wm, ((h1 + i * h2) % {BLOOM_BITS}) div 62),"
            f"           CAST(0 AS BIGINT))"
            f"  & shiftleft(CAST(1 AS BIGINT),"
            f"              CAST(((h1 + i * h2) % {BLOOM_BITS}) % 62 AS INT))"
            f") != 0)"
        )
        probe = tr.crossJoin(F.broadcast(wordmap)).select(
            "doc_id", "ng", hit_expr.cast("long").alias("hit")
        )
    else:
        probe = (
            tr.select(
                "doc_id",
                "ng",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(BLOOM_HASHES - 1)),
                        lambda i: (F.col("h1") + i * F.col("h2")) % BLOOM_BITS,
                    )
                ).alias("bit"),
            )
            .join(F.broadcast(words), F.expr("bit div 62") == F.col("w"), "left")
            .select(
                "doc_id",
                "ng",
                (
                    F.coalesce(F.col("mask"), F.lit(0)).bitwiseAND(
                        F.expr(
                            "shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))"
                        )
                    )
                    != 0
                )
                .cast("long")
                .alias("hit_i"),
            )
            .groupBy("doc_id", "ng")
            .agg(F.min("hit_i").alias("hit"))
        )
    truth = (
        hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD == 0)
        .select("ng")
        .distinct()
        .withColumn("is_true", F.lit(1))
    )
    return (
        probe.join(F.broadcast(truth), "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("hit").alias("n_bloom_candidates"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias(
                "n_true_contaminated"
            ),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long"),
            F.col("n_bloom_candidates").cast("long"),
            F.col("n_true_contaminated").cast("long"),
            (F.col("n_bloom_candidates") - F.col("n_true_contaminated"))
            .cast("long")
            .alias("n_false_positives"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ushas_spark.session import get_spark

    spark = get_spark("probe-bloom-r12", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = bloom_variant(spark, sf_dir, variant)
    counts = plan_counts(df._jdf.queryExecution().executedPlan())
    rows = df.collect()
    digest = hashlib.md5(
        "\n".join(str(tuple(r)) for r in rows).encode()
    ).hexdigest()
    spark.catalog.clearCache()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        bloom_variant(spark, sf_dir, variant).write.format("noop").mode(
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
