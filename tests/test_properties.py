"""Property-based cross-engine tests (hypothesis), mirroring the
reference's randomized expression testing (SURVEY.md section 5 item 2:
LiteralGenerator.scala / checkConsistencyBetweenInterpretedAndCodegen).
Here the two "evaluation paths" are Spark and DuckDB plus the exact
Python result, and the properties pin the portability contracts that
every oracle-gated query relies on:

- scaled-integer SUM is exact and partition-order independent;
- the md5-based 60-bit portable hash agrees across engines;
- word-shingle construction agrees across engines.

Each example spins one tiny Spark job, so example counts stay small --
these are contract checks, not fuzz farms.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from ushas_spark.operators.dedup import hash60, shingles, sql_hash60, sql_shingles
from ushas_spark.oracle_exact import SCALE, dec_sum, sql_dec_sum

# 2-dp "money" doubles, the domain the scaled-integer pattern is built for.
money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
).map(float)

words = st.text(alphabet="abcdef", min_size=1, max_size=5)


@settings(max_examples=6, deadline=None)
@given(st.lists(money, min_size=1, max_size=50))
def test_dec_sum_exact_and_engine_portable(spark, vals):
    """dec_sum == DuckDB mirror == exact Decimal arithmetic, regardless
    of row order or partitioning."""
    pdf = pd.DataFrame({"x": vals})
    sdf = spark.createDataFrame(pdf)
    got = {
        n: sdf.repartition(n).agg(dec_sum(F.col("x"), "s")).collect()[0]["s"]
        for n in (1, 7)
    }
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.sql(f"SELECT {sql_dec_sum('x', 's')} FROM t").fetchone()[0]
    exact = float(sum(Decimal(str(round(v, 2))) for v in vals))
    assert got[1] == got[7] == oracle
    assert abs(got[1] - exact) < 10 ** (-SCALE) * len(vals)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(alphabet="abc xyz", min_size=0, max_size=30), min_size=1, max_size=20))
def test_hash60_engine_portable(spark, texts):
    """The 60-bit md5 hash (split/dedup/bucketing primitive) must yield
    identical longs in both engines for identical strings."""
    pdf = pd.DataFrame({"t": texts})
    sdf = spark.createDataFrame(pdf)
    got = [r.h for r in sdf.select(hash60(F.col("t")).alias("h")).collect()]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [r[0] for r in con.sql(f"SELECT {sql_hash60('t')} FROM t").fetchall()]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(words, min_size=1, max_size=12))
def test_shingles_engine_portable(spark, toks):
    """Word-shingle sets (the MinHash/Jaccard input) agree across
    engines, including the under-width edge case."""
    text = " ".join(toks)
    pdf = pd.DataFrame({"text": [text]})
    sdf = spark.createDataFrame(pdf)
    got = sorted(sdf.select(shingles().alias("s")).collect()[0]["s"])
    con = duckdb.connect()
    con.register("d", pdf)
    want = sorted(con.sql(f"SELECT {sql_shingles('text')} FROM d").fetchone()[0])
    assert got == want
