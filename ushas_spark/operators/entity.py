"""Entity resolution: blocked fuzzy matching over a name column.

The reference has no record-linkage surface (it is a query-engine fork);
this is the classic dedup-adjacent operator a 100 TB catalog/CRM
pipeline runs constantly: find records whose NAMES are within a small
edit distance without ever computing the |names| x |names| product.

Design (the standard blocking-pass architecture, e.g. Fellegi-Sunter
style candidate generation):

1. **Entity reduction first**: fuzzy matching runs on the DISTINCT name
   table, never the fact table -- cardinality |distinct names|, which is
   orders of magnitude below row count. Fact-side frequencies join back
   onto the surviving pairs at the end (pair-scale, broadcastable).
2. **Multi-pass blocking**: candidate pairs come from a UNION of cheap
   equality blocks (first token, last token). Each pass is an ordinary
   hash equi-join -- shuffle on the block key, no theta join, no
   cartesian product. Multiple passes recover pairs any single key would
   miss (an edit inside the first token still matches on the last).
3. **Exact verify**: levenshtein() runs only on blocked candidates.

Recall of the two-pass blocker is pinned by test against the exhaustive
O(n^2) ground truth at test scale (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query

LEV_MAX = 2

_FUZZY_ORACLE = f"""
WITH names AS (
  SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY 1
), keyed AS (
  SELECT name, n_parts,
         regexp_extract(name, '^(\\S+)', 1) AS tok_first,
         regexp_extract(name, '(\\S+)$', 1) AS tok_last
  FROM names
), cand AS (
  SELECT a.name AS name_a, b.name AS name_b
  FROM keyed a JOIN keyed b ON a.tok_first = b.tok_first AND a.name < b.name
  UNION
  SELECT a.name, b.name
  FROM keyed a JOIN keyed b ON a.tok_last = b.tok_last AND a.name < b.name
)
SELECT c.name_a, c.name_b,
       CAST(levenshtein(c.name_a, c.name_b) AS BIGINT) AS lev,
       na.n_parts AS n_parts_a, nb.n_parts AS n_parts_b
FROM cand c
JOIN names na ON c.name_a = na.name
JOIN names nb ON c.name_b = nb.name
WHERE levenshtein(c.name_a, c.name_b) <= {LEV_MAX}
ORDER BY name_a, name_b
"""


@query("entity_fuzzy_match_blocked", oracle=_FUZZY_ORACLE)
def entity_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy name matching on part.p_name: pairs of distinct
    names within levenshtein <= {LEV_MAX}, found via two equality
    blocking passes (first token, last token) instead of an all-pairs
    scan, with per-name part counts joined back.

    Scale shape: the O(n^2) surface is eliminated twice -- the distinct
    reduction shrinks n to entity cardinality, and blocking turns the
    pair generation into two hash equi-joins whose cost is
    sum-of-block-sizes squared only WITHIN a block (bounded by token
    frequency, the same hot-key exposure every ER blocker has; a hot
    block would be handled with the operators/skew.py salting pattern).
    levenshtein() -- a JVM intrinsic on both engines -- prices only
    blocked candidates.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    keyed = names.select(
        "name",
        "n_parts",
        F.regexp_extract("name", r"^(\S+)", 1).alias("tok_first"),
        F.regexp_extract("name", r"(\S+)$", 1).alias("tok_last"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")

    def block(key: str) -> DataFrame:
        return a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.name") < F.col("b.name")),
        ).select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )

    cand = block("tok_first").union(block("tok_last")).distinct()
    verified = cand.filter(
        F.levenshtein("name_a", "name_b") <= LEV_MAX
    ).select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("lev"),
    )
    na = names.select(
        F.col("name").alias("name_a"), F.col("n_parts").alias("n_parts_a")
    )
    nb = names.select(
        F.col("name").alias("name_b"), F.col("n_parts").alias("n_parts_b")
    )
    return (
        verified.join(F.broadcast(na), "name_a")
        .join(F.broadcast(nb), "name_b")
        .select("name_a", "name_b", "lev", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )
