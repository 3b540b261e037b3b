"""The reference's subquery NEGATIVE cases: invalid queries must raise.

Reference inputs (read at runtime, same policy as the other conformance
suites):
  sql/core/src/test/resources/sql-tests/inputs/subquery/negative-cases/
    invalid-correlation.sql   -- illegal outer-reference placements
    subq-input-typecheck.sql  -- scalar-subquery arity / IN type errors

The reference's SQLQueryTestSuite asserts each statement errors; here
the same statements run verbatim against Spark 4's analyzer and each
must raise an AnalysisException-family error (the error CLASS moved
between Spark 2.4 and 4.x, so the assertion is "analysis rejects it",
not a message match -- the semantics under test is that none of these
silently return rows).
"""
from __future__ import annotations

import os

import pytest
from pyspark.errors import AnalysisException

NEG = "/root/reference/sql/core/src/test/resources/sql-tests/inputs/subquery/negative-cases"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(NEG), reason="reference resources not available"
)


@pytest.fixture(scope="module")
def neg_views(spark):
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW t1 AS SELECT * FROM VALUES (1, 2, 3) AS t1(t1a, t1b, t1c)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW t2 AS SELECT * FROM VALUES (1, 0, 1) AS t2(t2a, t2b, t2c)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW t3 AS SELECT * FROM VALUES (3, 1, 2) AS t3(t3a, t3b, t3c)"
    )
    yield
    for v in ("t1", "t2", "t3"):
        spark.catalog.dropTempView(v)


INVALID_CORRELATION = [
    # TC 01.01: subquery SELECT references a column that is neither
    # aggregated nor grouped.
    """SELECT t1a, t2b FROM t1, t2 WHERE t1b = t2c
       AND t2b = (SELECT max(avg) FROM
                  (SELECT t2b, avg(t2b) avg FROM t2 WHERE t2a = t1.t1b))""",
    # TC 01.02: outer reference (t2b) two subquery levels down.
    """SELECT * FROM t1 WHERE t1a IN
       (SELECT min(t2a) FROM t2 GROUP BY t2c HAVING t2c IN
        (SELECT max(t3c) FROM t3 GROUP BY t3b HAVING t3b > t2b))""",
    # TC 01.03: outer and local references mixed inside one aggregate.
    """SELECT t1a FROM t1 GROUP BY 1
       HAVING EXISTS (SELECT 1 FROM t2 WHERE t2a < min(t1a + t2a))""",
    # TC 01.04: same, nested one level deeper.
    """SELECT t1a FROM t1 WHERE t1a IN
       (SELECT t2a FROM t2 WHERE EXISTS
        (SELECT 1 FROM t3 GROUP BY 1 HAVING min(t2a + t3a) > 1))""",
]

TYPECHECK = [
    # scalar subquery returning two columns where one value is required.
    """SELECT (SELECT max(t2b), min(t2b) FROM t2
               WHERE t2.t2b = t1.t1b GROUP BY t2.t2b) FROM t1""",
    """SELECT (SELECT max(t2b), min(t2b) FROM t2
               WHERE t2.t2b > 0 GROUP BY t2.t2b) FROM t1""",
    # IN subquery with mismatched column counts.
    """SELECT * FROM t1 WHERE (t1a, t1b) IN (SELECT t2a FROM t2)""",
]


@pytest.mark.parametrize("i", range(len(INVALID_CORRELATION)))
def test_invalid_correlation_rejected(spark, neg_views, i):
    with pytest.raises(AnalysisException):
        spark.sql(INVALID_CORRELATION[i]).collect()


@pytest.mark.parametrize("i", range(len(TYPECHECK)))
def test_subquery_typecheck_rejected(spark, neg_views, i):
    with pytest.raises(AnalysisException):
        spark.sql(TYPECHECK[i]).collect()
