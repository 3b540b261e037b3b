"""IVF (inverted-file) approximate nearest neighbour -- the coarse-
quantiser counterpart to the LSH tables in ``similarity.py``.

Shape: pick K deterministic coarse centroids, assign every vector to its
nearest centroid (the "inverted list"), and at query time score only the
lists of the nprobe nearest centroids. At 100 TB the assignment is one
broadcast-join pass over the corpus and each query touches nprobe/K of
the data -- the same plan family as a partition-pruned scan, with the
centroid id acting as the partition key (a production deployment would
PARTITION the parquet BY the centroid id so probes prune files).

Determinism: centroids are actual corpus vectors chosen by id stride (no
random k-means init), all scoring uses the sequential-fold dot product,
so the DuckDB oracle reproduces the exact lists and results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    _dvec,
    cosine,
    sql_cosine,
)
from ushas_spark.registry import query

N_CENTROIDS = 8
CENTROID_STRIDE = 63  # centroid c = vector with vec_id == c * stride
NPROBE = 2


def _centroids(emb: DataFrame) -> DataFrame:
    ids = [c * CENTROID_STRIDE for c in range(N_CENTROIDS)]
    return emb.filter(F.col("vec_id").isin(ids)).select(
        (F.col("vec_id") / CENTROID_STRIDE).cast("int").alias("cid"),
        F.col("e").alias("ce"),
    )


def _assign(emb: DataFrame, cents: DataFrame, rank_limit: int, id_col: str) -> DataFrame:
    """Rank centroids per vector by cosine; keep the top ``rank_limit``
    (1 for corpus assignment, NPROBE for query probing)."""
    from pyspark.sql import Window as W

    scored = emb.crossJoin(F.broadcast(cents)).select(
        id_col,
        "e",
        "cid",
        F.round(cosine(F.col("e"), F.col("ce")) * 1_000_000).cast("long").alias("cs"),
    )
    w = W.partitionBy(id_col).orderBy(F.col("cs").desc(), "cid")
    return (
        scored.withColumn("crnk", F.row_number().over(w))
        .filter(F.col("crnk") <= rank_limit)
        .select(id_col, "e", "cid")
    )


_SQL_CENT_IDS = ", ".join(str(c * CENTROID_STRIDE) for c in range(N_CENTROIDS))

_IVF_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (
  SELECT CAST(vec_id / {CENTROID_STRIDE} AS INT) AS cid, e AS ce
  FROM v WHERE vec_id IN ({_SQL_CENT_IDS})
),
assign AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY CAST(ROUND({sql_cosine("v.e", "c.ce")} * 1000000) AS BIGINT) DESC,
                      c.cid) AS crnk
    FROM v, cents c
  ) WHERE crnk <= 1
),
qprobe AS (
  SELECT vec_id AS qid, e AS qe, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY CAST(ROUND({sql_cosine("v.e", "c.ce")} * 1000000) AS BIGINT) DESC,
                      c.cid) AS crnk
    FROM v, cents c
    WHERE v.vec_id < {N_QUERIES}
  ) WHERE crnk <= {NPROBE}
),
scored AS (
  SELECT DISTINCT q.qid, a.vec_id AS cand_id,
         CAST(ROUND({sql_cosine("q.qe", "a.e")} * 1000000) AS BIGINT) AS sim_x1m
  FROM qprobe q JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.qid
),
ranked AS (
  SELECT qid, cand_id, sim_x1m,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY sim_x1m DESC, cand_id) AS rnk
  FROM scored
)
SELECT qid, cand_id, sim_x1m, rnk
FROM ranked WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


def ivf_topk(
    emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES, nprobe: int = NPROBE
) -> DataFrame:
    """IVF search: corpus assigned to nearest centroid; queries probe
    their ``nprobe`` nearest centroid lists only."""
    from pyspark.sql import Window as W

    cents = _centroids(emb)
    assigned = _assign(emb, cents, 1, "vec_id")
    queries = _assign(
        emb.filter(F.col("vec_id") < n_queries), cents, nprobe, "vec_id"
    ).select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"), "cid")
    scored = (
        assigned.join(F.broadcast(queries), ["cid"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine(F.col("qe"), F.col("e")) * 1_000_000)
            .cast("long")
            .alias("sim_x1m"),
        )
        .distinct()
    )
    w = W.partitionBy("qid").orderBy(F.col("sim_x1m").desc(), "cand_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


@query("sim_ivf_topk", oracle=_IVF_ORACLE)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    return ivf_topk(emb).orderBy("qid", "rnk")


# --- IVF-PQ: coarse pruning + quantized ADC scoring (FAISS IVFPQ) ----------


def _ivfpq_oracle() -> str:
    from ushas_spark.operators.similarity import (
        _pq_codebook_sql,
        _pq_recon_expr,
        _pq_sqdist_int,
        sql_quantize_sq8,
    )
    from ushas_spark.operators.similarity import sql_cosine as _sqlcos

    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                  {sql_quantize_sq8('embedding')} AS qe
           FROM embeddings),
cents AS (
  SELECT CAST(vec_id / {CENTROID_STRIDE} AS INT) AS cid, e AS ce
  FROM v WHERE vec_id IN ({_SQL_CENT_IDS})
),
{_pq_codebook_sql().strip()}
,
assign AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY CAST(ROUND({_sqlcos("v.e", "c.ce")} * 1000000) AS BIGINT) DESC,
                      c.cid) AS crnk
    FROM v, cents c
  ) WHERE crnk <= 1
),
recon AS (
  SELECT vec_id, {_pq_recon_expr('qe', 'cs', 'duck')} AS re FROM v, cb
),
qprobe AS (
  SELECT vec_id AS qid, qe AS qq, cid FROM (
    SELECT v.vec_id, v.qe, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY CAST(ROUND({_sqlcos("v.e", "c.ce")} * 1000000) AS BIGINT) DESC,
                      c.cid) AS crnk
    FROM v, cents c
    WHERE v.vec_id < {N_QUERIES}
  ) WHERE crnk <= {NPROBE}
),
scored AS (
  SELECT DISTINCT q.qid, a.vec_id AS cand_id,
         CAST({_pq_sqdist_int('q.qq', 'r.re', 'duck')} AS BIGINT) AS adc_dist
  FROM qprobe q
  JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.qid
  JOIN recon r ON r.vec_id = a.vec_id
),
ranked AS (
  SELECT qid, cand_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY adc_dist, cand_id) AS rnk
  FROM scored
)
SELECT qid, cand_id, adc_dist, rnk
FROM ranked WHERE rnk <= {TOP_K}
ORDER BY qid, rnk
"""


@query("sim_ivfpq_topk", oracle=_ivfpq_oracle())
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the production vector-index composition -- the IVF
    coarse quantiser prunes to nprobe inverted lists, then candidates
    score by integer ADC against their PQ codeword reconstructions
    (FAISS IVFPQ, re-expressed as two composable DataFrame operators).
    At 100 TB: the corpus stores cid + 8 PQ codes per vector (partition
    by cid to turn probes into partition pruning); a query touches
    nprobe/K of the data and never reads a float vector.
    """
    from pyspark.sql import Window as W

    from ushas_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_STRIDE,
        PQ_SUB,
        _pq_recon_expr,
        _pq_sqdist_int,
        quantize_sq8,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        _dvec(F.col("embedding")).alias("e"),
        quantize_sq8(F.col("embedding")).alias("qe"),
    )
    cents = _centroids(emb)
    assigned = _assign(emb, cents, 1, "vec_id").select("vec_id", "cid")
    # PQ reconstruction of every corpus vector (broadcast codebook).
    ids = [k * PQ_STRIDE for k in range(PQ_K)]
    cwsrc = emb.filter(F.col("vec_id").isin(ids)).select(
        (F.col("vec_id") / PQ_STRIDE).cast("int").alias("k"), "qe"
    )
    cw = cwsrc.select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"), "qe"
    ).selectExpr("m", "k", f"slice(qe, m * {PQ_SUB} + 1, {PQ_SUB}) AS sub")
    cb = cw.agg(F.collect_list(F.struct("m", "k", "sub")).alias("cs"))
    recon = emb.crossJoin(F.broadcast(cb)).selectExpr(
        "vec_id", f"{_pq_recon_expr('qe', 'cs', 'spark')} AS re"
    )
    queries = _assign(
        emb.filter(F.col("vec_id") < N_QUERIES), cents, NPROBE, "vec_id"
    ).join(
        emb.select("vec_id", "qe"), "vec_id"
    ).select(F.col("vec_id").alias("qid"), F.col("qe").alias("qq"), "cid")
    cand = (
        assigned.join(F.broadcast(queries), ["cid"])
        .filter(F.col("vec_id") != F.col("qid"))
        .join(recon, "vec_id")
    )
    scored = cand.selectExpr(
        "qid",
        "vec_id AS cand_id",
        f"CAST({_pq_sqdist_int('qq', 're', 'spark')} AS BIGINT) AS adc_dist",
    ).distinct()
    w = W.partitionBy("qid").orderBy("adc_dist", "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("qid", "rnk")
    )


# ------------------------------------------------- nprobe recall sweep
SWEEP_NPROBES = (1, 2, 4)


def _nprobe_chain(p: int) -> str:
    return f"""
qp{p} AS (
  SELECT vec_id AS qid, e AS qe, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY CAST(ROUND({sql_cosine("v.e", "c.ce")} * 1000000) AS BIGINT) DESC,
                      c.cid) AS crnk
    FROM v, cents c
    WHERE v.vec_id < {N_QUERIES}
  ) WHERE crnk <= {p}
),
sc{p} AS (
  SELECT DISTINCT q.qid, a.vec_id AS cand_id,
         CAST(ROUND({sql_cosine("q.qe", "a.e")} * 1000000) AS BIGINT) AS sim_x1m
  FROM qp{p} q JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.qid
),
rk{p} AS (
  SELECT qid, cand_id FROM (
    SELECT qid, cand_id,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim_x1m DESC, cand_id) AS rnk
    FROM sc{p}) WHERE rnk <= {TOP_K}
)"""


def _nprobe_sweep_oracle() -> str:
    head = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (
  SELECT CAST(vec_id / {CENTROID_STRIDE} AS INT) AS cid, e AS ce
  FROM v WHERE vec_id IN ({_SQL_CENT_IDS})
),
assign AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY CAST(ROUND({sql_cosine("v.e", "c.ce")} * 1000000) AS BIGINT) DESC,
                      c.cid) AS crnk
    FROM v, cents c
  ) WHERE crnk <= 1
),
truth AS (
  SELECT qid, cand_id FROM (
    SELECT q.vec_id AS qid, v.vec_id AS cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(ROUND({sql_cosine("q.e", "v.e")} * 1000000) AS BIGINT) DESC,
                      v.vec_id) AS rnk
    FROM v q JOIN v ON v.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rnk <= {TOP_K}
)"""
    chains = "".join("," + _nprobe_chain(p) for p in SWEEP_NPROBES)
    selects = " UNION ALL ".join(
        f"SELECT {p} AS nprobe,"
        f" CAST(COUNT(*) AS BIGINT) AS n_truth,"
        f" CAST(SUM(CASE WHEN r.cand_id IS NOT NULL THEN 1 ELSE 0 END)"
        f"   AS BIGINT) AS n_hit,"
        f" CAST(1000 * SUM(CASE WHEN r.cand_id IS NOT NULL THEN 1 ELSE 0 END)"
        f"   // COUNT(*) AS BIGINT) AS recall_x1000"
        f" FROM truth t LEFT JOIN rk{p} r"
        f"   ON r.qid = t.qid AND r.cand_id = t.cand_id"
        for p in SWEEP_NPROBES
    )
    return head + chains + "\nSELECT * FROM (" + selects + ") ORDER BY nprobe"


@query("sim_ivf_nprobe_sweep", oracle=_nprobe_sweep_oracle())
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe RECALL SWEEP: recall@{TOP_K} against the exact
    brute-force truth at nprobe = {{1, 2, 4}} -- the cost/recall curve
    that picks the probe width before an IVF index serves traffic
    (companion to sim_ann_recall_at_k, which scores the LSH index).
    More probed lists monotonically raise recall; the sweep shows by
    how much, in exact integers.

    Scale shape: corpus assignment and the brute-force truth each
    compute ONCE (materialized); each nprobe point reuses them with
    one probe join + per-query rank. At production scale the truth arm
    runs on a sampled query slice; shape unchanged."""
    from pyspark.sql import Window as W

    from ushas_spark.durability import materialize
    from ushas_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    emb = materialize(emb)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e")
    )
    truth = materialize(cosine_topk(q, emb).select("qid", "cand_id"))
    rows = []
    for p in SWEEP_NPROBES:
        got = ivf_topk(emb, nprobe=p).select(
            F.col("qid").alias("g_qid"), F.col("cand_id").alias("g_cand")
        )
        joined = truth.join(
            got,
            (F.col("qid") == F.col("g_qid"))
            & (F.col("cand_id") == F.col("g_cand")),
            "left",
        )
        rows.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_truth"),
                F.sum(F.col("g_cand").isNotNull().cast("long")).alias(
                    "n_hit"
                ),
            ).select(
                F.lit(p).cast("long").alias("nprobe"),
                "n_truth",
                "n_hit",
                F.expr("1000 * n_hit div n_truth").alias("recall_x1000"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("nprobe")
