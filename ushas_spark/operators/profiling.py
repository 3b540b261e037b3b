"""Data profiling: the ANALYZE-grade statistics a pipeline consults
before choosing join/partition strategies.

Two operators:

- :func:`profile_table_stats` — per-column null fraction, exact
  distinct count, min/max for a fixed column set. The hand-rolled
  equivalent of ANALYZE TABLE ... FOR COLUMNS (reference:
  sql/core/src/main/scala/org/apache/spark/sql/execution/command/
  AnalyzeColumnCommand.scala), emitted as a queryable DataFrame instead
  of catalog metadata. One pass, every statistic map-side combinable
  except the exact distincts (which Spark plans via expand +
  two-phase aggregation).
- :func:`profile_join_keys` — per-key frequency skew profile of a
  prospective join column: top hot keys plus the p50/p90/p99/max of the
  key-frequency distribution. This is the number you look at before
  deciding broadcast vs salting (operators/skew.py); at 100 TB the
  frequency table is |distinct keys| rows and the quantiles are exact
  ranks over it, not approximations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query

_PROF_COLS = ["l_quantity", "l_discount", "l_linestatus", "l_returnflag"]

_STATS_ORACLE = """
WITH t AS (SELECT * FROM lineitem)
""" + "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_repr,
       CAST(MAX({c}) AS VARCHAR) AS max_repr
FROM t"""
    for c in _PROF_COLS
) + "\nORDER BY col_name"


@query("profile_table_stats", oracle=_STATS_ORACLE)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of lineitem (nulls, exact ndv, min/max)."""
    t = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in _PROF_COLS:
        parts.append(
            t.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(c).cast("string").alias("min_repr"),
                F.max(c).cast("string").alias("max_repr"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


_SKEW_KEY = "l_partkey"
_TOP_HOT = 5

_SKEW_ORACLE = f"""
WITH freq AS (
  SELECT {_SKEW_KEY} AS key, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), hot AS (
  SELECT 'hot' AS kind,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank,
         key, n
  FROM freq ORDER BY n DESC, key LIMIT {_TOP_HOT}
), ff AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS cnt FROM freq GROUP BY n
), cum AS (
  SELECT n, SUM(cnt) OVER (ORDER BY n
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(cnt) OVER () AS nk
  FROM ff
), quant AS (
  SELECT 'p' || p AS kind, CAST(p AS BIGINT) AS rank,
         CAST(NULL AS BIGINT) AS key, CAST(MIN(n) AS BIGINT) AS n
  FROM cum JOIN (VALUES (50), (90), (99)) q(p)
    ON c >= GREATEST(1, CAST(CEIL(nk * p / 100.0) AS BIGINT))
  GROUP BY p
)
SELECT * FROM hot UNION ALL SELECT * FROM quant
ORDER BY kind, rank
"""


@query("profile_join_keys", oracle=_SKEW_ORACLE)
def profile_join_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of lineitem.{_SKEW_KEY}: the {_TOP_HOT}
    hottest keys plus exact p50/p90/p99 key frequencies -- the inputs
    to the broadcast-vs-salt decision.

    Scale shape: hot keys are an orderBy+limit (TakeOrderedAndProject,
    per-partition heaps, no global sort); frequency quantiles come from
    the frequency-OF-frequencies table -- |distinct frequency values|
    rows, typically a few hundred regardless of key cardinality -- so
    the only window runs over that tiny table, never over the
    billion-key frequency table itself.
    """
    freq = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col(_SKEW_KEY).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hot = (
        freq.orderBy(F.col("n").desc(), "key")
        .limit(_TOP_HOT)
        .select(
            F.lit("hot").alias("kind"),
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), "key"))
            .cast("long")
            .alias("rank"),
            "key",
            "n",
        )
    )
    ff = freq.groupBy("n").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = W.orderBy("n").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = ff.select(
        "n",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(W.partitionBy()).alias("nk"),
    )
    pcts = spark.createDataFrame([(50,), (90,), (99,)], "p long")
    quant = (
        cum.crossJoin(F.broadcast(pcts))
        .where(
            F.col("c")
            >= F.greatest(
                F.lit(1),
                F.ceil(F.col("nk") * F.col("p") / F.lit(100.0)).cast("long"),
            )
        )
        .groupBy("p")
        .agg(F.min("n").alias("n"))
        .select(
            F.concat(F.lit("p"), F.col("p")).alias("kind"),
            F.col("p").alias("rank"),
            F.lit(None).cast("long").alias("key"),
            "n",
        )
    )
    return hot.unionByName(quant).orderBy("kind", "rank")


# ------------------------------------------- declarative data expectations
_EXPECT_ORACLE = """
WITH o_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS v_null,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_uniq,
         CAST(SUM(CASE WHEN o_totalprice < 10000 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_price
  FROM orders
), l_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
           AS v_qty,
         CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
           AS v_disc
  FROM lineitem
), ri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
), rules AS (
  SELECT 'orders.o_custkey_not_null' AS rule, n AS n_checked,
         v_null AS n_violations FROM o_stats
  UNION ALL
  SELECT 'orders.o_orderkey_unique', n, v_uniq FROM o_stats
  UNION ALL
  SELECT 'orders.o_totalprice_min_10k', n, v_price FROM o_stats
  UNION ALL
  SELECT 'lineitem.l_quantity_le_50', n, v_qty FROM l_stats
  UNION ALL
  SELECT 'lineitem.l_discount_le_5pct', n, v_disc FROM l_stats
  UNION ALL
  SELECT 'orders.o_custkey_fk_customer', o_stats.n, ri.v
  FROM o_stats, ri
)
SELECT rule, n_checked, n_violations,
       CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
FROM rules
ORDER BY rule
"""


@query("profile_expectations", oracle=_EXPECT_ORACLE)
def profile_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations in the dbt-test / Deequ
    mold: not-null, uniqueness, range, and referential-integrity rules
    evaluated in bulk, emitted as one (rule, n_checked, n_violations,
    status) report. The rule set mixes passing checks with two that
    genuinely fail on this data (o_totalprice >= 10k, l_discount <= 5%)
    so the report exercises both branches.

    Scale shape: all single-table rules for one table fold into ONE
    scan + one scalar aggregate (conditional sums are map-side
    combinable; the uniqueness check is the only one that shuffles, as
    a two-phase distinct count). The FK rule is a broadcast left-anti
    join against the dimension -- no all-pairs, no second fact scan per
    rule. At 100 TB the whole report costs two fact scans (orders,
    lineitem) plus one broadcast.

    Reference analog: ANALYZE-style stats live in
    AnalyzeColumnCommand.scala; a rules engine over them has no
    reference counterpart (beyond-reference operator).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")

    one = F.lit(1)
    o_stats = o.agg(
        F.count(one).alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long").alias("v_null"),
        (F.count(one) - F.count_distinct("o_orderkey")).alias("v_uniq"),
        F.sum(F.when(F.col("o_totalprice") < 10000, 1).otherwise(0))
        .cast("long").alias("v_price"),
    )
    l_stats = li.agg(
        F.count(one).alias("n"),
        F.sum(F.when(F.col("l_quantity") > 50, 1).otherwise(0))
        .cast("long").alias("v_qty"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
        .cast("long").alias("v_disc"),
    )
    orders_rules = o_stats.select(
        F.expr(
            "stack(3,"
            " 'orders.o_custkey_not_null', n, v_null,"
            " 'orders.o_orderkey_unique', n, v_uniq,"
            " 'orders.o_totalprice_min_10k', n, v_price)"
            " AS (rule, n_checked, n_violations)"
        )
    )
    lineitem_rules = l_stats.select(
        F.expr(
            "stack(2,"
            " 'lineitem.l_quantity_le_50', n, v_qty,"
            " 'lineitem.l_discount_le_5pct', n, v_disc)"
            " AS (rule, n_checked, n_violations)"
        )
    )
    ri = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(one).alias("v"))
    )
    fk_rule = (
        o_stats.select("n")
        .crossJoin(ri)
        .select(
            F.lit("orders.o_custkey_fk_customer").alias("rule"),
            F.col("n").alias("n_checked"),
            F.col("v").alias("n_violations"),
        )
    )
    report = orders_rules.unionByName(lineitem_rules).unionByName(fk_rule)
    return report.select(
        "rule",
        "n_checked",
        "n_violations",
        F.when(F.col("n_violations") == 0, "pass").otherwise("fail")
        .alias("status"),
    ).orderBy("rule")


# ------------------------------------------------- categorical concentration
_GINI_COLS = ["o_orderstatus", "o_orderpriority"]

_GINI_ORACLE = (
    "WITH "
    + ", ".join(
        f"""f_{c} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY {c}
), g_{c} AS (
  SELECT '{c}' AS col_name,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(ROUND(1000000.0 * (SUM(cnt) * SUM(cnt) - SUM(cnt * cnt))
                    / (CAST(SUM(cnt) AS DOUBLE) * SUM(cnt))) AS BIGINT)
           AS gini_x1m
  FROM f_{c}
)"""
        for c in _GINI_COLS
    )
    + " "
    + " UNION ALL ".join(f"SELECT * FROM g_{c}" for c in _GINI_COLS)
    + " ORDER BY col_name"
)


@query("profile_gini_impurity", oracle=_GINI_ORACLE)
def profile_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical concentration profile: Gini impurity
    (1 - sum(p_i^2)) per column -- the skew/uniformity signal a query
    planner or feature-quality check reads, chosen over Shannon entropy
    because it needs NO logarithm: (N^2 - sum(c_i^2)) / N^2 is exact
    integer arithmetic until one final double division, so it gates
    bit-for-bit where log-based entropy cannot (libm log differs across
    engines in the last ulp).

    Scale shape: one frequency aggregate per column (map-side
    combinable, shuffle = |distinct values|), then a scalar rollup of
    the frequency table. The sum of squared counts stays under 2^63 up
    to ~3e9 rows per column value set; beyond that, accumulate in
    DECIMAL(38,0).
    """
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for c in _GINI_COLS:
        freq = o.groupBy(c).agg(F.count(F.lit(1)).alias("cnt"))
        parts.append(
            freq.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.sum("cnt").alias("n_rows"),
                F.round(
                    F.lit(1_000_000.0)
                    * (
                        F.sum("cnt") * F.sum("cnt")
                        - F.sum(F.col("cnt") * F.col("cnt"))
                    )
                    / (F.sum("cnt").cast("double") * F.sum("cnt"))
                ).cast("long").alias("gini_x1m"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


# ---------------------------------------------- pairwise Pearson profile
_CORR_COLS = [
    ("l_quantity", "CAST(l_quantity AS BIGINT)", 1),
    ("l_extendedprice", "CAST(ROUND(l_extendedprice * 100) AS BIGINT)", 100),
    ("l_discount", "CAST(ROUND(l_discount * 100) AS BIGINT)", 100),
    ("l_tax", "CAST(ROUND(l_tax * 100) AS BIGINT)", 100),
]


def _corr_oracle() -> str:
    names = [n for n, _, _ in _CORR_COLS]
    sels = ", ".join(f"{expr} AS {n}" for n, expr, _ in _CORR_COLS)
    stat_cols = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for n in names:
        stat_cols.append(f"CAST(SUM({n}) AS BIGINT) AS s_{n}")
    for i, a in enumerate(names):
        for b in names[i:]:
            stat_cols.append(f"CAST(SUM({a} * {b}) AS BIGINT) AS s_{a}_{b}")
    pair_rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            pair_rows.append(
                f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
       CAST(ROUND(1000000.0 *
         (CAST(n AS DOUBLE) * s_{a}_{b} - CAST(s_{a} AS DOUBLE) * s_{b}) /
         (sqrt(CAST(n AS DOUBLE) * s_{a}_{a}
               - CAST(s_{a} AS DOUBLE) * s_{a}) *
          sqrt(CAST(n AS DOUBLE) * s_{b}_{b}
               - CAST(s_{b} AS DOUBLE) * s_{b}))) AS BIGINT) AS corr_x1m
FROM stats"""
            )
    return (
        f"WITH t AS (SELECT {sels} FROM lineitem),\n"
        f"stats AS (SELECT {', '.join(stat_cols)} FROM t)\n"
        + "\nUNION ALL\n".join(pair_rows)
        + "\nORDER BY col_a, col_b"
    )


@query("profile_correlation_matrix", oracle=_corr_oracle())
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over the numeric lineitem columns
    from EXACT integer sufficient statistics -- the same one-aggregate
    pattern as agg_linear_regression, widened to the full triangular
    matrix: one scan accumulates n, per-column sums, and all pairwise
    product sums as BIGINTs (map-side combinable); the correlations
    derive in double from identical integers on both engines. The
    built-in corr() folds doubles in partition order and cannot gate.

    Scale shape: ONE scan, one scalar aggregate, |cols|^2/2 output
    rows. Columns enter x100-scaled so products stay integral;
    headroom note as in agg_linear_regression (DECIMAL(38) beyond
    ~sf1 row counts).
    """
    li = load_table(spark, sf_dir, "lineitem")
    names = [n for n, _, _ in _CORR_COLS]
    t = li.select(
        F.col("l_quantity").cast("long").alias("l_quantity"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias(
            "l_extendedprice"
        ),
        F.round(F.col("l_discount") * 100).cast("long").alias("l_discount"),
        F.round(F.col("l_tax") * 100).cast("long").alias("l_tax"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for n in names:
        aggs.append(F.sum(n).alias(f"s_{n}"))
    for i, a in enumerate(names):
        for b in names[i:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}"))
    stats = t.agg(*aggs)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            nn = F.col("n").cast("double")
            sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
            sab = F.col(f"s_{a}_{b}").cast("double")
            saa = F.col(f"s_{a}_{a}").cast("double")
            sbb = F.col(f"s_{b}_{b}").cast("double")
            rows.append(
                stats.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(
                        F.lit(1_000_000.0)
                        * (nn * sab - sa * sb)
                        / (
                            F.sqrt(nn * saa - sa * sa)
                            * F.sqrt(nn * sbb - sb * sb)
                        )
                    ).cast("long").alias("corr_x1m"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("col_a", "col_b")


# ------------------------------------------- run fingerprint (reproducibility)
# Canonical per-row serialisations: every column rendered to a string
# with an exact, engine-shared rule (dates ISO, money as x100 ints), so
# the row hash -- and therefore the table fingerprint -- is identical
# across engines, partitionings, runs, and backfills.
_FP_CANON = {
    "orders": (
        "CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING), "
        "o_orderstatus, CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) "
        "AS STRING), CAST(CAST(o_orderdate AS DATE) AS STRING), "
        "o_orderpriority"
    ),
    "nation": (
        "CAST(n_nationkey AS STRING), n_name, CAST(n_regionkey AS STRING)"
    ),
    "documents": (
        "CAST(doc_id AS STRING), source, CAST(n_chars AS STRING), md5(text)"
    ),
}

_FP_MOD = 2147483647


def _fp_oracle() -> str:
    parts = []
    for t, cols in _FP_CANON.items():
        duck_cols = cols.replace("AS STRING", "AS VARCHAR")
        parts.append(
            f"SELECT '{t}' AS table_name,"
            f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(SUM(('0x' || substring(md5(concat_ws('|', {duck_cols})),"
            f" 1, 15))::BIGINT % {_FP_MOD}) % {_FP_MOD} AS BIGINT)"
            f" AS fingerprint FROM {t}"
        )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") ORDER BY table_name"
    )


@query("profile_run_fingerprint", oracle=_fp_oracle())
def profile_run_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content FINGERPRINT of the corpus: per table, row count plus an
    order-independent checksum (sum mod p of a 60-bit md5 over each
    row's canonical serialisation) -- the re-run/backfill verification
    primitive: two pipeline runs produced identical data iff their
    fingerprint tables match, with no row-by-row diff and no ordering
    assumptions. Canonicalisation rules (ISO dates, x100 money ints,
    md5 of long text) make the hash engine-portable, so the oracle
    computes the identical fingerprint from the same parquet.

    Scale shape: one scan per table, map-side hash + commutative sum
    (any partitioning, any order), 1 row out per table. At 100 TB this
    is the cheapest possible equality certificate between snapshots
    (companion: pipeline_snapshot_diff localises WHERE they differ)."""
    from ushas_spark.operators.dedup import hash60

    outs = []
    for t, cols in _FP_CANON.items():
        df = load_table(spark, sf_dir, t)
        canon = F.concat_ws("|", *[F.expr(c) for c in cols.split(", ")])
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.sum(hash60(canon) % _FP_MOD) % _FP_MOD).alias(
                    "fingerprint"
                ),
            ).select(
                F.lit(t).alias("table_name"), "n_rows", "fingerprint"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name")


# --------------------------------------------------------- data card
_DATACARD_ORACLE = """
WITH t AS (
  SELECT doc_id, source, text, n_chars,
         len(regexp_split_to_array(text, '\\s+')) AS n_tok,
         md5(text) AS digest
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(n_tok) // COUNT(*) AS BIGINT) AS avg_tokens_per_doc,
       CAST(COUNT(*) - COUNT(DISTINCT digest) AS BIGINT) AS n_exact_dup_docs,
       CAST(1000000 * (COUNT(*) - COUNT(DISTINCT digest)) // COUNT(*)
            AS BIGINT) AS dup_rate_x1m,
       CAST(SUM(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_short_docs,
       CAST(SUM(CASE WHEN n_tok > 1000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long_docs,
       CAST(MIN(n_tok) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tok) AS BIGINT) AS max_tokens
FROM t
"""


@query("profile_data_card", oracle=_DATACARD_ORACLE)
def profile_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic dataset DATA CARD: the one-row datasheet a corpus
    release ships with -- volumes (docs / tokens / chars / sources),
    exact-duplication rate, and length-distribution red flags (short
    and very long tails), all exact integers. The deep dives hang off
    it: dedup_* for the duplication number, text_quality_score /
    text_lang_guess for content quality, text_pii_scrub for
    compliance, pipeline_source_mix for balance.

    Scale shape: ONE corpus scan; every statistic is map-side
    combinable (count / sum / min / max / two distinct aggregates that
    each shuffle once on digest / source). No Python anywhere."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "n_chars",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tok"),
        F.md5("text").alias("digest"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.expr("sum(n_tok) div count(1)").alias("avg_tokens_per_doc"),
        (F.count(F.lit(1)) - F.countDistinct("digest")).alias(
            "n_exact_dup_docs"
        ),
        F.expr(
            "1000000 * (count(1) - count(DISTINCT digest)) div count(1)"
        ).alias("dup_rate_x1m"),
        F.sum((F.col("n_tok") < 20).cast("long")).alias("n_short_docs"),
        F.sum((F.col("n_tok") > 1000).cast("long")).alias("n_long_docs"),
        F.min("n_tok").alias("min_tokens"),
        F.max("n_tok").alias("max_tokens"),
    )
