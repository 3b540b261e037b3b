"""r13 probe #3: pipeline_bloom_prefilter (VERDICT r12 item 6).

Shipped shape (5 shuffles): the ``hashed`` subtree (documents scan →
3-gram zip_with → array_distinct → explode → TWO md5-based hash60
evaluations per gram) is referenced THREE times (ev→bits/words, tr→
probe, truth) and therefore evaluated three times; the probe stage
explodes 3 bit rows per gram and re-groups by (doc_id, ng) -- an
exchange carrying full 3-word gram STRINGS whose only job is to bring
the 3 bit-tests of one gram back together.

Variants:

- mat: ``hashed = materialize(hashed)`` -- one scan+explode+md5 pass,
  three cheap re-reads (the r12 item-5/10 scan-reuse transfer; also
  freezes h1/h2 so no downstream shape can re-evaluate md5).
- narrowmat: mat + the probe groupBy keyed on (doc_id, gram POSITION)
  (posexplode of the per-doc array_distinct'd gram array -- positions
  are unique per doc by construction, so the key is provably 1:1 with
  (doc_id, ng)), with the truth join moved BEFORE the bit explode so
  the gram string never enters any exchange [guide §2.3 narrower
  types]. The probe exchange carries (long, int, tiny ints) instead of
  (long, ~25-byte string, ...).
- threejoinmat: mat + NO bit explode and NO probe groupBy at all: the
  three bit probes become three broadcast left joins against the
  67-row words table (real hash relations -- dodging the r12 probe-#9
  map linear-scan negative) and the hit is an in-row AND; straight to
  the final per-doc aggregate. Probe-side shuffles 2 → 0.

All variants keep bits/words construction byte-identical (the r12
probe adjudicated bits.distinct() as a planned no-op and the in-row
word-map as a measured loss; neither is re-probed).

Run: python tools/probe_bloom_r13.py {shipped|mat|narrowmat|threejoinmat} [sf_dir]
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

from ushas_spark.durability import materialize
from ushas_spark.operators.dedup import hash60
from ushas_spark.operators.pipeline import (
    BLOOM_BITS,
    BLOOM_HASHES,
    _DECONTAM_EVAL_MOD,
    pipeline_bloom_prefilter,
)
from ushas_spark.io import load_table


def _ngs_col():
    toks = F.split(F.col("text"), r"\s+")
    n = F.size(toks)
    return F.when(
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


def _hashed(spark: SparkSession, sf_dir: str, with_pos: bool) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    if with_pos:
        base = d.select(
            "doc_id", F.posexplode(_ngs_col()).alias("gi", "ng")
        )
    else:
        base = d.select("doc_id", F.explode(_ngs_col()).alias("ng"))
    return base.select(
        *base.columns,
        (hash60(F.col("ng")) % BLOOM_BITS).alias("h1"),
        (
            F.lit(1)
            + hash60(F.concat(F.col("ng"), F.lit("|"))) % (BLOOM_BITS - 1)
        ).alias("h2"),
    )


def _words(ev: DataFrame) -> DataFrame:
    bits = (
        ev.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(BLOOM_HASHES - 1)),
                    lambda i: (F.col("h1") + i * F.col("h2")) % BLOOM_BITS,
                )
            ).alias("bit")
        )
        .distinct()
    )
    return bits.groupBy(F.expr("bit div 62").alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))")
        ).alias("mask")
    )


def _final(probeagg: DataFrame) -> DataFrame:
    return probeagg.select(
        "doc_id",
        F.col("n_grams").cast("long"),
        F.col("n_bloom_candidates").cast("long"),
        F.col("n_true_contaminated").cast("long"),
        (F.col("n_bloom_candidates") - F.col("n_true_contaminated"))
        .cast("long")
        .alias("n_false_positives"),
    ).orderBy("doc_id")


def bloom_mat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipped shape with the hashed gram table materialized once."""
    hashed = materialize(_hashed(spark, sf_dir, with_pos=False))
    ev = hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD == 0)
    words = _words(ev)
    tr = hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD != 0)
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
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))")
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
        ev.select("ng").distinct().withColumn("is_true", F.lit(1))
    )
    agg = (
        probe.join(F.broadcast(truth), "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("hit").alias("n_bloom_candidates"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias(
                "n_true_contaminated"
            ),
        )
    )
    return _final(agg)


def bloom_narrowmat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mat + position-keyed probe agg + truth joined before the explode:
    no gram string enters any exchange."""
    hashed = materialize(_hashed(spark, sf_dir, with_pos=True))
    ev = hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD == 0)
    words = _words(ev)
    truth = ev.select("ng").distinct().withColumn("is_true", F.lit(1))
    tr = (
        hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD != 0)
        .join(F.broadcast(truth), "ng", "left")
        .select(
            "doc_id",
            "gi",
            "h1",
            "h2",
            F.coalesce(F.col("is_true"), F.lit(0)).alias("it"),
        )
    )
    probe = (
        tr.select(
            "doc_id",
            "gi",
            "it",
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
            "gi",
            "it",
            (
                F.coalesce(F.col("mask"), F.lit(0)).bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))")
                )
                != 0
            )
            .cast("long")
            .alias("hit_i"),
        )
        .groupBy("doc_id", "gi")
        .agg(F.min("hit_i").alias("hit"), F.min("it").alias("is_true"))
    )
    agg = probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("hit").alias("n_bloom_candidates"),
        F.sum("is_true").alias("n_true_contaminated"),
    )
    return _final(agg)


def bloom_threejoinmat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mat + three broadcast word-joins, in-row hit, no probe shuffle."""
    hashed = materialize(_hashed(spark, sf_dir, with_pos=False))
    ev = hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD == 0)
    words = _words(ev)
    truth = ev.select("ng").distinct().withColumn("is_true", F.lit(1))
    tr = (
        hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD != 0)
        .join(F.broadcast(truth), "ng", "left")
        .select(
            "doc_id",
            "h1",
            "h2",
            F.coalesce(F.col("is_true"), F.lit(0)).alias("it"),
        )
    )
    cur = tr
    tests = []
    for i in range(BLOOM_HASHES):
        b = (F.col("h1") + F.lit(i) * F.col("h2")) % BLOOM_BITS
        wi = words.select(
            F.col("w").alias(f"w{i}"), F.col("mask").alias(f"mask{i}")
        )
        cur = cur.withColumn(f"b{i}", b).join(
            F.broadcast(wi),
            F.expr(f"b{i} div 62") == F.col(f"w{i}"),
            "left",
        )
        tests.append(
            F.coalesce(F.col(f"mask{i}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(b{i} % 62 AS INT))")
            )
            != 0
        )
    hit = tests[0]
    for t in tests[1:]:
        hit = hit & t
    agg = (
        cur.select("doc_id", "it", hit.cast("long").alias("hit"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("hit").alias("n_bloom_candidates"),
            F.sum("it").alias("n_true_contaminated"),
        )
    )
    return _final(agg)


def bloom_r12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r13 shipped formulation, frozen here verbatim after the
    restructure landed so the comparison stays reproducible (probe runs
    before the ship used `shipped` = this shape)."""
    hashed = _hashed(spark, sf_dir, with_pos=False)
    ev = hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD == 0)
    words = _words(ev)
    tr = hashed.filter(F.col("doc_id") % _DECONTAM_EVAL_MOD != 0)
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
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))")
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
    agg = (
        probe.join(F.broadcast(truth), "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("hit").alias("n_bloom_candidates"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias(
                "n_true_contaminated"
            ),
        )
    )
    return _final(agg)


VARIANTS = {
    "shipped": pipeline_bloom_prefilter,
    "r12": bloom_r12,
    "mat": bloom_mat,
    "narrowmat": bloom_narrowmat,
    "threejoinmat": bloom_threejoinmat,
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
