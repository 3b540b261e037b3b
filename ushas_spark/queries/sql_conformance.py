"""SQL-surface conformance shapes (SURVEY.md section 5 item 4: the
reference's sql-tests golden files -- group-by.sql, window.sql,
typeCoercion/, natural-join, ...). Each query pins a parser/analyzer
behavior that the operator batteries don't isolate: ordinals, HAVING
without GROUP BY, LATERAL VIEW, aliases in ORDER BY, coercion in unions
and comparisons."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ushas_spark.io import register_views
from ushas_spark.registry import query


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(text)


_ORDINALS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("sql_group_order_by_ordinal", oracle=_ORDINALS)
def sql_group_order_by_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY / ORDER BY ordinal positions (group-by-ordinal.sql)."""
    return _sql(spark, sf_dir, _ORDINALS)


_HAVING_NO_GROUP = """
SELECT COUNT(*) AS n FROM orders HAVING COUNT(*) > 0
"""


@query("sql_having_without_group_by", oracle=_HAVING_NO_GROUP)
def sql_having_without_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING with no GROUP BY == global aggregate filter (having.sql)."""
    return _sql(spark, sf_dir, _HAVING_NO_GROUP)


_ORDER_BY_ALIAS = """
SELECT o_orderkey, o_totalprice * 2 AS doubled
FROM orders
ORDER BY doubled DESC, o_orderkey
LIMIT 20
"""


@query("sql_order_by_alias", oracle=_ORDER_BY_ALIAS)
def sql_order_by_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY references a select-list alias (resolution order quirk
    both engines implement)."""
    return _sql(spark, sf_dir, _ORDER_BY_ALIAS)


_LATERAL_VIEW = """
SELECT doc_id, word
FROM documents
LATERAL VIEW explode(split(text, ' ')) t AS word
WHERE doc_id < 5
ORDER BY doc_id, word
"""

_LATERAL_VIEW_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS word
FROM documents
WHERE doc_id < 5
ORDER BY doc_id, word
"""


@query("sql_lateral_view", oracle=_LATERAL_VIEW_ORACLE)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode -- the HiveQL generator syntax (reference:
    Generate + UnresolvedGenerator resolution)."""
    return _sql(spark, sf_dir, _LATERAL_VIEW)


_HAVING_AGG_NOT_SELECTED = """
SELECT o_orderstatus
FROM orders
GROUP BY o_orderstatus
HAVING COUNT(*) > 100 AND MAX(o_totalprice) > 200000
ORDER BY o_orderstatus
"""


@query("sql_having_unselected_agg", oracle=_HAVING_AGG_NOT_SELECTED)
def sql_having_unselected_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over aggregates that are NOT in the select list."""
    return _sql(spark, sf_dir, _HAVING_AGG_NOT_SELECTED)


_UNION_COERCION = """
SELECT x FROM (
  SELECT CAST(1 AS INT) AS x
  UNION ALL
  SELECT CAST(2.5 AS DOUBLE)
  UNION ALL
  SELECT CAST(3 AS BIGINT)
)
ORDER BY x
"""


@query("sql_union_type_coercion", oracle=_UNION_COERCION)
def sql_union_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union branch coercion int/bigint/double -> double
    (typeCoercion/widenSetOperationTypes)."""
    return _sql(spark, sf_dir, _UNION_COERCION)


_CASE_NULL = """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS open_price,
       COALESCE(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END, -1.0) AS coalesced,
       (NULL = 1) IS NULL AS threevalued,
       NOT (NULL = 1) IS NULL AS negated_check
FROM orders
ORDER BY o_orderkey
LIMIT 50
"""


@query("sql_case_null_semantics", oracle=_CASE_NULL)
def sql_case_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE without ELSE -> NULL; three-valued logic round-trips."""
    return _sql(spark, sf_dir, _CASE_NULL)


_NESTED_AGG_SUBQ = """
SELECT s.o_orderstatus, s.total_n
FROM (
  SELECT o_orderstatus, COUNT(*) AS total_n,
         SUM(COUNT(*)) OVER () AS grand
  FROM orders GROUP BY o_orderstatus
) s
WHERE s.total_n * 4 > s.grand
ORDER BY s.o_orderstatus
"""


@query("sql_window_over_aggregate", oracle=_NESTED_AGG_SUBQ)
def sql_window_over_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function over an aggregate result (SUM(COUNT(*)) OVER ()) --
    the analyzer must nest agg-then-window (window.sql family)."""
    return _sql(spark, sf_dir, _NESTED_AGG_SUBQ)


_LATERAL_CORRELATED = """
SELECT n.n_name, t.top_cust, t.top_bal
FROM nation n,
LATERAL (
  SELECT c_name AS top_cust, c_acctbal AS top_bal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 1
) t
ORDER BY n.n_name
"""


@query("sql_lateral_correlated", oracle=_LATERAL_CORRELATED)
def sql_lateral_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery in FROM (top-1-per-group as a lateral
    join) -- the Spark 3.2+ upgrade over the reference's 2.4 parser, which
    only had LATERAL VIEW generators. Planned as a correlated
    DomainJoin -> rewritten to a join + window internally; nations with no
    customers drop out (inner lateral semantics, identical in DuckDB)."""
    return _sql(spark, sf_dir, _LATERAL_CORRELATED)


_INTERVAL_ARITH = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS STRING) AS due_date,
       CAST(CAST(o_orderdate - INTERVAL 1 MONTH AS DATE) AS STRING) AS prior_month,
       CAST(CAST(o_orderdate + INTERVAL 2 HOUR AS TIMESTAMP) AS STRING) AS plus_2h
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
"""


@query("sql_interval_arithmetic", oracle=_INTERVAL_ARITH)
def sql_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL literal arithmetic through the parser (reference:
    CalendarIntervalType, datetimeExpressions TimeAdd/TimeSub). Month
    addition end-of-month clamping agrees across engines; outputs cast to
    DATE/TIMESTAMP so the comparison is type-stable."""
    return _sql(spark, sf_dir, _INTERVAL_ARITH)


_GROUP_BY_ALL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY ALL
ORDER BY o_orderstatus, o_orderpriority
"""


@query("sql_group_by_all", oracle=_GROUP_BY_ALL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (infer grouping keys from the select list) -- Spark
    3.4+ / DuckDB shared surface; same SQL text runs on both engines."""
    return _sql(spark, sf_dir, _GROUP_BY_ALL)


_RECURSIVE_CALENDAR = """
WITH RECURSIVE cal(d) AS (
  SELECT CAST('1996-01-01' AS DATE)
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM cal
  WHERE d < CAST('1996-03-31' AS DATE)
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT CAST(EXTRACT(MONTH FROM cal.d) AS BIGINT) AS month,
       COUNT(*) AS n_days,
       CAST(SUM(CASE WHEN daily.n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_order_days,
       CAST(COALESCE(SUM(daily.n_orders), 0) AS BIGINT) AS n_orders
FROM cal LEFT JOIN daily ON cal.d = daily.d
GROUP BY 1
ORDER BY month
"""


@query("sql_recursive_cte_calendar", oracle=_RECURSIVE_CALENDAR)
def sql_recursive_cte_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.0 -- absent in the reference's 2.4
    parser): generate a 91-day calendar spine recursively, left join
    per-day order counts, report zero-order gaps per month -- the
    canonical gap-filling-with-a-generated-calendar analytics pattern.
    The SAME SQL text runs on Spark and DuckDB (UnionLoopExec executes
    the iteration in Spark; recursion depth is bounded by the date
    predicate, so no runaway)."""
    return _sql(spark, sf_dir, _RECURSIVE_CALENDAR)


_DISTRIBUTE_SQL = """
SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_orderkey <= 200
DISTRIBUTE BY l_returnflag SORT BY l_returnflag, l_orderkey, l_linenumber
"""

_DISTRIBUTE_ORACLE = """
SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_orderkey <= 200
ORDER BY l_returnflag, l_orderkey, l_linenumber
"""


@query("sql_distribute_sort_by", oracle=_DISTRIBUTE_ORACLE)
def sql_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY (the HiveQL physical-layout clauses the
    reference parser inherits -- reference: SqlBase.g4 queryOrganization):
    hash-repartition on the key, sort within partitions. Row content is
    unchanged (the gate compares order-insensitively); the physical
    contract -- RepartitionByExpression + partition-local Sort, no
    global exchange-ordering -- is pinned in tests/test_plans.py."""
    return _sql(spark, sf_dir, _DISTRIBUTE_SQL)


_CLUSTER_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM orders WHERE o_orderkey <= 400
CLUSTER BY o_orderpriority
"""

_CLUSTER_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM orders WHERE o_orderkey <= 400
ORDER BY o_orderpriority
"""


@query("sql_cluster_by", oracle=_CLUSTER_ORACLE)
def sql_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY = DISTRIBUTE BY + SORT BY on the same keys."""
    return _sql(spark, sf_dir, _CLUSTER_SQL)


_PIVOT_SQL = """
SELECT * FROM (
  SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
)
PIVOT (SUM(qty) FOR l_linestatus IN ('O' AS qty_o, 'F' AS qty_f))
ORDER BY l_returnflag
"""

_PIVOT_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("sql_pivot_syntax", oracle=_PIVOT_ORACLE)
def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-level PIVOT clause (parser surface beyond the reference's
    grammar -- Spark 2.4+ AstBuilder pivot; the DataFrame .pivot path is
    covered separately by agg_pivot). The oracle is the equivalent
    conditional aggregation; quantities are cast to BIGINT per-row so
    both engines sum integers exactly."""
    return _sql(spark, sf_dir, _PIVOT_SQL)


_FILTER_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_high_disc,
       CAST(SUM(CAST(l_quantity AS BIGINT))
            FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS qty_open,
       MAX(l_shipdate) FILTER (WHERE l_discount = 0) AS last_full_price_ship
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("sql_filter_clause", oracle=_FILTER_SQL)
def sql_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clause -- the SQL:2003 per-aggregate
    predicate surface (Spark 3.0+ parser; the reference's 2.4 grammar
    lacks it, making this an upgrade-over-reference row like LATERAL and
    GROUP BY ALL). The SAME SQL text runs on both engines."""
    return _sql(spark, sf_dir, _FILTER_SQL)


_HINT_SQL = """
SELECT /*+ BROADCAST(n) */ n.n_name, COUNT(*) AS n_cust
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""

_HINT_ORACLE = """
SELECT n.n_name, COUNT(*) AS n_cust
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query("sql_join_hint_broadcast", oracle=_HINT_ORACLE)
def sql_join_hint_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-comment join hints (/*+ BROADCAST(alias) */) -- the
    parser-level hint surface (reference: the 2.4 grammar accepts
    hints; ResolveJoinStrategyHints resolves them). The hint is
    semantics-preserving, so the oracle is the plain join; the plan
    effect (BroadcastHashJoin on the hinted side) is asserted in
    tests/test_plans.py."""
    return _sql(spark, sf_dir, _HINT_SQL)


_NULLSAFE_ORACLE = """
WITH o AS (
  SELECT NULLIF(o_orderstatus, 'O') AS k, o_orderkey FROM orders
), d(k, label) AS (
  VALUES ('F', 'finished'), ('P', 'pending'), (NULL, 'open')
)
SELECT d.label, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM o JOIN d ON o.k IS NOT DISTINCT FROM d.k
GROUP BY d.label
ORDER BY d.label
"""


@query("sql_null_safe_join", oracle=_NULLSAFE_ORACLE)
def sql_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark's <=> operator, ANSI's IS NOT
    DISTINCT FROM -- the reference parser's EqualNullSafe expression):
    NULL keys MATCH each other instead of vanishing, the semantics
    dimension lookups with a NULL-means-other bucket rely on. The keys
    are NULLIF-derived so the null path genuinely carries rows."""
    register_views(spark, sf_dir)
    return _sql(
        spark,
        sf_dir,
        """
SELECT d.label, COUNT(o.o_orderkey) AS n_orders
FROM (SELECT NULLIF(o_orderstatus, 'O') AS k, o_orderkey FROM orders) o
JOIN VALUES ('F', 'finished'), ('P', 'pending'), (CAST(NULL AS STRING), 'open')
     AS d(k, label)
  ON o.k <=> d.k
GROUP BY d.label
ORDER BY d.label
""",
    )


# ---------------------------------------------------------------------------
# Round 4: the highest-traffic remaining sql-tests input families --
# typeCoercion/native/*, subquery/ variants, cte.sql, extract.sql,
# stringCastAndExpressions.sql (reference:
# sql/core/src/test/resources/sql-tests/inputs/).

_IMPLICIT_CASTS = """
SELECT CAST('5' + 3 AS BIGINT)            AS str_plus_int,
       CAST('2' * 2.5 AS DOUBLE)          AS str_times_decimal,
       CAST(1 = '1' AS BOOLEAN)           AS int_eq_str,
       CAST(CAST(1 AS TINYINT) + CAST(2 AS SMALLINT)
            + CAST(3 AS INT) + CAST(4 AS BIGINT) AS BIGINT)
                                          AS widened_sum,
       CAST(1 < 1.5 AS BOOLEAN)           AS int_lt_double,
       CAST(CAST(7 AS BIGINT) = 7.0 AS BOOLEAN) AS long_eq_double
"""

# DuckDB refuses the bare string+int ('+' is ambiguous between INTEGER
# and DATE overloads) -- a real dialect divergence; the oracle casts
# explicitly so it states the VALUE Spark's implicit promotion must hit.
_IMPLICIT_CASTS_ORACLE = _IMPLICIT_CASTS.replace(
    "'5' + 3", "CAST('5' AS BIGINT) + 3"
)


@query("sql_implicit_type_casts", oracle=_IMPLICIT_CASTS_ORACLE)
def sql_implicit_type_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit numeric/string coercions in arithmetic and comparison
    (typeCoercion/native/implicitTypeCasts.sql,
    promoteStrings.sql): string operands promote to numeric inside the
    expression; the outer CASTs only normalise engine result-type
    rendering so the gate compares the coerced VALUES."""
    return _sql(spark, sf_dir, _IMPLICIT_CASTS)


_DIVISION = """
SELECT CAST(7 / 2 AS DOUBLE)         AS int_div_is_fractional,
       CAST(7 % 3 AS BIGINT)         AS modulus,
       CAST(-7 % 3 AS BIGINT)        AS negative_modulus,
       CAST(7.0 / 2 AS DOUBLE)       AS double_div,
       CAST(1 / CAST(3 AS DOUBLE) AS DOUBLE) AS repeating
"""


@query("sql_division_semantics", oracle=_DIVISION)
def sql_division_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Division/modulus semantics (typeCoercion/native/division.sql):
    `/` on integers yields a fractional result (both engines), `%`
    keeps the dividend's sign."""
    return _sql(spark, sf_dir, _DIVISION)


_CASE_COERCION = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0.5 END)
            AS DOUBLE) AS mixed_numeric_branches,
       MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderpriority
                ELSE 'other' END) AS string_branches
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("sql_case_when_coercion", oracle=_CASE_COERCION)
def sql_case_when_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE branch type unification (typeCoercion/native/
    caseWhenCoercion.sql): INT and DECIMAL branches widen to a common
    numeric type; string branches stay string."""
    return _sql(spark, sf_dir, _CASE_COERCION)


_IN_CONVERSION = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_str_list,
       CAST(SUM(CASE WHEN o_orderkey IN (1.0, 2.0, 3.5) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_frac_list
FROM orders
WHERE o_orderstatus IN ('F', 'O')
  AND o_orderkey IN ('1', '2', '3', '4', '5', '6', '7', '32', '33', '34')
"""


@query("sql_in_list_conversion", oracle=_IN_CONVERSION)
def sql_in_list_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list element coercion (typeCoercion/native/inConversion.sql):
    string literals coerce against a BIGINT column; fractional literals
    compare exactly (3.5 matches no integer key)."""
    return _sql(spark, sf_dir, _IN_CONVERSION)


_WIDEN_SETOP = """
SELECT CAST(v AS DOUBLE) AS v FROM (
  SELECT o_orderkey AS v FROM orders WHERE o_orderkey <= 5
  UNION
  SELECT o_totalprice AS v FROM orders WHERE o_orderkey <= 5
) t
ORDER BY v
"""


@query("sql_widen_setop_types", oracle=_WIDEN_SETOP)
def sql_widen_setop_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation type widening (typeCoercion/native/
    widenSetOperationTypes.sql): BIGINT and DOUBLE branches unify to
    DOUBLE before the distinct union."""
    return _sql(spark, sf_dir, _WIDEN_SETOP)


_CONCAT_COERCION = """
SELECT CONCAT(o_orderkey, ':', o_orderstatus) AS concat_mixed,
       o_orderstatus || '/' || o_orderpriority AS pipe_concat
FROM orders
WHERE o_orderkey <= 10
ORDER BY o_orderkey
"""


@query("sql_concat_coercion", oracle=_CONCAT_COERCION)
def sql_concat_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCAT / || over non-string operands (typeCoercion/native/
    concat.sql): numeric arguments implicitly render as strings
    identically on both engines (integers -- no fractional rendering
    ambiguity)."""
    return _sql(spark, sf_dir, _CONCAT_COERCION)


_SUBQ_IN_FROM = """
SELECT t2.status, CAST(t2.n AS BIGINT) AS n, CAST(t2.total_x100 AS BIGINT) AS total_x100
FROM (
  SELECT t1.status,
         COUNT(*) AS n,
         SUM(t1.price_x100) AS total_x100
  FROM (
    SELECT o_orderstatus AS status,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_x100
    FROM orders
    WHERE o_orderkey % 7 = 0
  ) t1
  GROUP BY t1.status
) t2
ORDER BY t2.status
"""


@query("sql_subquery_in_from", oracle=_SUBQ_IN_FROM)
def sql_subquery_in_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested derived tables with alias scoping (subquery/
    subquery-in-from.sql): inner aliases must resolve at each level and
    not leak outward."""
    return _sql(spark, sf_dir, _SUBQ_IN_FROM)


_EXISTS_AND_OR = """
SELECT c_custkey, c_acctbal
FROM customer c
WHERE c_acctbal < -900
   OR (EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > 400000)
       AND c_mktsegment = 'BUILDING')
ORDER BY c_custkey
"""


@query("sql_exists_within_and_or", oracle=_EXISTS_AND_OR)
def sql_exists_within_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS nested under OR/AND (subquery/exists-subquery/
    exists-within-and-or.sql): the planner cannot use a plain semi join
    -- it needs an existence join feeding the disjunction."""
    return _sql(spark, sf_dir, _EXISTS_AND_OR)


_NOT_IN_NULLS = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN c_custkey NOT IN
                     (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                                  ELSE o_custkey END
                      FROM orders)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_not_in_with_nulls,
       CAST(SUM(CASE WHEN c_custkey NOT IN
                     (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_not_in_clean,
       CAST(SUM(CASE WHEN c_custkey IN
                     (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                                  ELSE o_custkey END
                      FROM orders)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_in_with_nulls
FROM customer
"""


@query("sql_not_in_null_semantics", oracle=_NOT_IN_NULLS)
def sql_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued NOT IN (subquery/in-subquery/not-in-unit-tests-*):
    a single NULL in the subquery makes every NOT IN row UNKNOWN
    (n_not_in_with_nulls = 0) while IN still matches the non-null
    values; the clean NOT IN counts genuinely orderless customers."""
    return _sql(spark, sf_dir, _NOT_IN_NULLS)


_SCALAR_SELECT_WHERE = """
SELECT n_name,
       CAST((SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey)
            AS BIGINT) AS n_customers
FROM nation n
WHERE (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) >=
      (SELECT MIN(cnt) FROM (SELECT COUNT(*) AS cnt
                             FROM supplier GROUP BY s_nationkey) t)
ORDER BY n_name
"""


@query("sql_scalar_subquery_positions", oracle=_SCALAR_SELECT_WHERE)
def sql_scalar_subquery_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in both SELECT and WHERE plus an
    uncorrelated aggregate-of-aggregate threshold (subquery/
    scalar-subquery/scalar-subquery-select.sql)."""
    return _sql(spark, sf_dir, _SCALAR_SELECT_WHERE)


_CTE_CHAIN = """
WITH region_nations AS (
  SELECT r.r_name, n.n_nationkey, n.n_name
  FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
), nation_customers AS (
  SELECT rn.r_name, rn.n_name, COUNT(c.c_custkey) AS n_cust
  FROM region_nations rn
  LEFT JOIN customer c ON c.c_nationkey = rn.n_nationkey
  GROUP BY rn.r_name, rn.n_name
), per_region AS (
  SELECT r_name, COUNT(*) AS n_nations, SUM(n_cust) AS n_customers
  FROM nation_customers
  GROUP BY r_name
)
SELECT a.r_name,
       CAST(a.n_nations AS BIGINT) AS n_nations,
       CAST(a.n_customers AS BIGINT) AS n_customers,
       CAST((SELECT MAX(n_cust) FROM nation_customers b
             WHERE b.r_name = a.r_name) AS BIGINT) AS max_nation_customers
FROM per_region a
ORDER BY a.r_name
"""


@query("sql_cte_chain_reuse", oracle=_CTE_CHAIN)
def sql_cte_chain_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs (a second CTE built on the first) with the second
    one additionally re-referenced from a correlated scalar subquery
    (cte.sql): name resolution must find the CTE definition from both
    the main query and the subquery scope."""
    return _sql(spark, sf_dir, _CTE_CHAIN)


_EXTRACT_FIELDS = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_orderkey <= 400
GROUP BY 1, 2, 3, 4
ORDER BY 1, 2, 3, 4
"""


@query("sql_extract_fields", oracle=_EXTRACT_FIELDS)
def sql_extract_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT(field FROM date) for the portable fields (extract.sql):
    YEAR/QUARTER/MONTH/DAY agree across engines (weekday numbering does
    not -- covered engine-specifically in expr_date_battery)."""
    return _sql(spark, sf_dir, _EXTRACT_FIELDS)


_STRING_CASTS = """
SELECT CAST(CAST('  42 ' AS INT) AS BIGINT)      AS trimmed_int,
       CAST('3.25' AS DOUBLE)                    AS str_double,
       CAST(CAST('1996-07-04' AS DATE) AS STRING) AS str_date_roundtrip,
       CAST(LENGTH(CAST(12345 AS STRING)) AS BIGINT) AS int_str_len,
       CAST(CAST('true' AS BOOLEAN) AS BOOLEAN)  AS str_bool
"""


@query("sql_string_cast_expressions", oracle=_STRING_CASTS)
def sql_string_cast_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String<->primitive cast matrix (typeCoercion/native/
    stringCastAndExpressions.sql, cast.sql): whitespace-tolerant
    numeric parsing, date round-trip, boolean literals."""
    return _sql(spark, sf_dir, _STRING_CASTS)


_NULL_PROP = """
SELECT CAST(NULL + 1 AS BIGINT)                    AS null_plus,
       CAST(NULL * 0 AS BIGINT)                    AS null_times_zero,
       CAST(FALSE AND NULL AS BOOLEAN)             AS false_and_null,
       CAST(TRUE OR NULL AS BOOLEAN)               AS true_or_null,
       CAST((NULL AND TRUE) IS NULL AS BOOLEAN)    AS null_and_true_unknown,
       CAST(COALESCE(NULL, NULL, 7) AS BIGINT)     AS coalesce_chain,
       CAST(NULLIF(3, 3) AS BIGINT)                AS nullif_equal,
       CAST(NULLIF(3, 4) AS BIGINT)                AS nullif_differs,
       CAST(NULL IS NULL AS BOOLEAN)               AS is_null,
       CAST(('a' || CAST(NULL AS STRING)) IS NULL AS BOOLEAN)
                                                   AS concat_null_propagates
"""


@query("sql_null_propagation", oracle=_NULL_PROP)
def sql_null_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL propagation through arithmetic, three-valued boolean logic
    (FALSE AND NULL = FALSE, TRUE OR NULL = TRUE), COALESCE/NULLIF
    (null-propagation.sql, null-handling.sql)."""
    return _sql(spark, sf_dir, _NULL_PROP)


_PREDICATES = """
SELECT CAST(SUM(CASE WHEN o_totalprice BETWEEN 1000 AND 2000
                THEN 1 ELSE 0 END) AS BIGINT)                AS n_between,
       CAST(SUM(CASE WHEN o_orderpriority LIKE '_-URGENT'
                THEN 1 ELSE 0 END) AS BIGINT)                AS n_like_underscore,
       CAST(SUM(CASE WHEN o_orderpriority ILIKE 'x%'
                THEN 1 ELSE 0 END) AS BIGINT)                AS n_ilike,
       CAST(SUM(CASE WHEN '50%' LIKE '50!%' ESCAPE '!'
                THEN 1 ELSE 0 END) AS BIGINT)                AS n_escaped_like,
       CAST(SUM(CASE WHEN o_orderstatus IS DISTINCT FROM 'O'
                THEN 1 ELSE 0 END) AS BIGINT)                AS n_is_distinct
FROM orders
"""


@query("sql_predicate_functions", oracle=_PREDICATES)
def sql_predicate_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery: BETWEEN, LIKE with _ wildcard, ILIKE, LIKE
    with a custom ESCAPE character, IS DISTINCT FROM
    (predicate-functions.sql, like-all/any family)."""
    return _sql(spark, sf_dir, _PREDICATES)


_TVF_RANGE = """
SELECT CAST(t.id AS BIGINT) AS id,
       CAST(t.id * t.id AS BIGINT) AS square
FROM range(0, 10) AS t(id)
WHERE t.id % 2 = 0
ORDER BY t.id
"""


@query("sql_table_valued_range", oracle=_TVF_RANGE)
def sql_table_valued_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range() as a table-valued function with a column alias list
    (table-valued-functions.sql)."""
    return _sql(spark, sf_dir, _TVF_RANGE)


_INLINE_TABLE = """
SELECT t.grp, CAST(SUM(t.v) AS BIGINT) AS total
FROM (VALUES ('a', 1), ('a', 2), ('b', 3), ('b', NULL)) AS t(grp, v)
GROUP BY t.grp
ORDER BY t.grp
"""


@query("sql_inline_table_alias", oracle=_INLINE_TABLE)
def sql_inline_table_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table with a full column alias list, including a
    NULL cell that must type-join with the column (inline-table.sql,
    table-aliases.sql)."""
    return _sql(spark, sf_dir, _INLINE_TABLE)


_OPERATORS_MISC = """
SELECT CAST(5 & 3 AS BIGINT)        AS bit_and,
       CAST(5 | 3 AS BIGINT)        AS bit_or,
       CAST(~5 AS BIGINT)           AS bit_not,
       CAST(-(-7) AS BIGINT)        AS double_negate,
       CAST(ABS(-42) AS BIGINT)     AS abs_neg,
       CAST(GREATEST(1, NULL, 3) AS BIGINT) AS greatest_skips_null,
       CAST(LEAST(CAST(NULL AS INT), CAST(NULL AS INT)) AS BIGINT)
                                    AS least_all_null
"""


@query("sql_operator_misc", oracle=_OPERATORS_MISC)
def sql_operator_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise &, |, ~, unary minus, GREATEST/LEAST null-skipping
    (operators.sql). XOR and shifts are engine-divergent spellings
    (Spark ^ is xor, DuckDB ^ is power) -- covered engine-specifically
    in expr_math_battery."""
    return _sql(spark, sf_dir, _OPERATORS_MISC)


_COMPARATOR = """
SELECT CAST('abc' < 'abd' AS BOOLEAN)    AS str_lt,
       CAST('abc' < 'ab'  AS BOOLEAN)    AS prefix_gt,
       CAST('B' < 'a' AS BOOLEAN)        AS case_matters_binary,
       CAST('' < 'a' AS BOOLEAN)         AS empty_lowest,
       CAST(GREATEST('apple', 'pear', 'fig') AS STRING) AS greatest_str
"""


@query("sql_string_comparators", oracle=_COMPARATOR)
def sql_string_comparators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary string comparison semantics: lexicographic order, prefix
    ordering, case significance under the default binary collation
    (comparator.sql)."""
    return _sql(spark, sf_dir, _COMPARATOR)


_STRUCT_SPARK = """
SELECT s.o_orderstatus,
       CAST(MAX(s.pair.price_x100) AS BIGINT) AS max_price_x100,
       CAST(MIN(s.pair.key) AS BIGINT)        AS min_key
FROM (
  SELECT o_orderstatus,
         struct(o_orderkey AS key,
                CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_x100)
           AS pair
  FROM orders
) s
GROUP BY s.o_orderstatus
ORDER BY s.o_orderstatus
"""

_STRUCT_ORACLE = """
SELECT s.o_orderstatus,
       CAST(MAX(s.pair.price_x100) AS BIGINT) AS max_price_x100,
       CAST(MIN(s.pair.key) AS BIGINT)        AS min_key
FROM (
  SELECT o_orderstatus,
         struct_pack(key := o_orderkey,
                     price_x100 := CAST(ROUND(o_totalprice * 100) AS BIGINT))
           AS pair
  FROM orders
) s
GROUP BY s.o_orderstatus
ORDER BY s.o_orderstatus
"""


@query("sql_struct_field_access", oracle=_STRUCT_ORACLE)
def sql_struct_field_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction with named fields and dotted field access
    through a subquery + aggregation (struct.sql). Construction syntax
    is engine-specific (struct() vs struct_pack()); the access/agg
    semantics under test are shared."""
    return _sql(spark, sf_dir, _STRUCT_SPARK)


_COUNT_VARIANTS_SPARK = """
SELECT CAST(COUNT(*) AS BIGINT)                       AS count_star,
       CAST(COUNT(1) AS BIGINT)                       AS count_one,
       CAST(COUNT(c_acctbal) AS BIGINT)               AS count_col,
       CAST(COUNT(DISTINCT c_nationkey, c_mktsegment) AS BIGINT)
                                                      AS count_distinct_pair,
       CAST((SELECT COUNT(*) FROM customer WHERE c_custkey < 0) AS BIGINT)
                                                      AS count_empty
FROM customer
"""

_COUNT_VARIANTS_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT)                       AS count_star,
       CAST(COUNT(1) AS BIGINT)                       AS count_one,
       CAST(COUNT(c_acctbal) AS BIGINT)               AS count_col,
       CAST(COUNT(DISTINCT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment)
            AS BIGINT)                                AS count_distinct_pair,
       CAST((SELECT COUNT(*) FROM customer WHERE c_custkey < 0) AS BIGINT)
                                                      AS count_empty
FROM customer
"""


@query("sql_count_variants", oracle=_COUNT_VARIANTS_ORACLE)
def sql_count_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT forms (count.sql): star, literal, nullable column,
    multi-column DISTINCT (Spark-native; the oracle spells it as a
    concatenated key since DuckDB's COUNT(DISTINCT) is single-arg),
    and COUNT over an empty relation = 0, not NULL."""
    return _sql(spark, sf_dir, _COUNT_VARIANTS_SPARK)


_ORDER_BY_ALL = """
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@query("sql_order_by_all", oracle=_ORDER_BY_ALL)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL (sort by every select-list column left to right) --
    the Spark 4 / DuckDB shared shorthand, completing GROUP BY ALL
    (sql_group_by_all); same text runs on both engines."""
    return _sql(spark, sf_dir, _ORDER_BY_ALL)


_LITERALS_SPARK = """
SELECT CAST(DATE '1996-07-04' AS STRING)              AS date_lit,
       CAST(TIMESTAMP '1996-07-04 12:30:00' AS STRING) AS ts_lit,
       CAST(1.5e3 AS DOUBLE)                          AS exp_double,
       CAST(.5 AS DOUBLE)                             AS bare_fraction,
       CAST(1e-2 AS DOUBLE)                           AS neg_exponent,
       hex(X'4142')                                   AS hex_binary,
       CAST(9223372036854775807 AS BIGINT)            AS max_bigint
"""

# Spark's X'..' binary literal spells as from_hex() in DuckDB.
_LITERALS_ORACLE = _LITERALS_SPARK.replace("X'4142'", "from_hex('4142')")


@query("sql_literal_battery", oracle=_LITERALS_ORACLE)
def sql_literal_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed and numeric literal parsing (literals.sql): DATE/TIMESTAMP
    typed literals, exponent and bare-fraction numerics, hex binary
    (engine-specific spelling, identical bytes), BIGINT boundary."""
    return _sql(spark, sf_dir, _LITERALS_SPARK)


_REGEX_COLS_ORACLE = """
SELECT o_orderkey, o_custkey, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_orderkey <= 100
GROUP BY o_orderkey, o_custkey
ORDER BY o_orderkey
"""


@query("sql_quoted_regex_columns", oracle=_REGEX_COLS_ORACLE)
def sql_quoted_regex_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-identifier REGEX column expansion (query_regex_column.sql;
    HiveQL surface behind spark.sql.parser.quotedRegexColumnNames):
    `o_.*key` selects every matching column. The conf is flipped only
    around this statement; the oracle states the expansion explicitly."""
    register_views(spark, sf_dir)
    prev = spark.conf.get("spark.sql.parser.quotedRegexColumnNames", "false")
    spark.conf.set("spark.sql.parser.quotedRegexColumnNames", "true")
    try:
        return spark.sql(
            """
SELECT o_orderkey, o_custkey, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT `o_.*key` FROM orders WHERE o_orderkey <= 100) t
GROUP BY o_orderkey, o_custkey
ORDER BY o_orderkey
"""
        )
    finally:
        spark.conf.set("spark.sql.parser.quotedRegexColumnNames", prev)


_REPARTITION_HINT = """
SELECT /*+ REPARTITION(8, o_custkey) */
       o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 10
ORDER BY o_custkey
"""

_REPARTITION_HINT_ORACLE = """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 10
ORDER BY o_custkey
"""


@query("sql_repartition_hint", oracle=_REPARTITION_HINT_ORACLE)
def sql_repartition_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPARTITION(n, cols) hint through the parser (hints.sql /
    ResolveHints): a partitioning directive must never change results
    -- the oracle is the hint-free statement. (The broadcast-hint
    analog is sql_join_hint_broadcast; plan effects of explicit
    repartitioning are asserted in tests/test_plans.py.)"""
    return _sql(spark, sf_dir, _REPARTITION_HINT)


_SETOP_NULLS = """
SELECT 'intersect' AS op, x FROM (
  SELECT x FROM (VALUES (1), (NULL), (3)) t(x)
  INTERSECT
  SELECT x FROM (VALUES (NULL), (3), (4)) s(x)
)
UNION ALL
SELECT 'except' AS op, x FROM (
  SELECT x FROM (VALUES (1), (NULL), (3)) t(x)
  EXCEPT
  SELECT x FROM (VALUES (NULL), (4)) s(x)
)
ORDER BY op, x NULLS FIRST
"""


@query("sql_setop_null_semantics", oracle=_SETOP_NULLS)
def sql_setop_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL equality in set operations (intersect-all.sql /
    except.sql): unlike `=`, INTERSECT and EXCEPT treat NULLs as
    EQUAL (group semantics), so NULL survives the intersect and is
    removed by the except -- identical three-valued-logic carve-out on
    both engines."""
    return _sql(spark, sf_dir, _SETOP_NULLS)


_SCRIPTING_ORACLE = """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_x100
FROM orders WHERE o_orderkey <= 10 ORDER BY o_orderkey
"""


@query("sql_scripting_block", oracle=_SCRIPTING_ORACLE)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN ... END with DECLARE): a compound
    statement declares a local variable and the final SELECT -- the
    block's result -- reads it. Absent from the reference's 2.4 parser
    entirely (a deliberate engine upgrade); the oracle states the
    inlined equivalent."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
BEGIN
  DECLARE key_cap INT DEFAULT 10;
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_x100
  FROM orders WHERE o_orderkey <= key_cap ORDER BY o_orderkey;
END
"""
    )


_EXEC_IMM_ORACLE = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
FROM orders WHERE o_totalprice > 150000
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("sql_execute_immediate", oracle=_EXEC_IMM_ORACLE)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with a ? parameter (Spark 4 dynamic SQL): the
    statement text is a value, the threshold arrives via USING -- the
    safe-templating surface; oracle is the bound equivalent."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
EXECUTE IMMEDIATE
  'SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
   FROM orders WHERE o_totalprice > ?
   GROUP BY o_orderstatus ORDER BY o_orderstatus'
  USING 150000
"""
    )


_SESSION_VAR_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_small
FROM orders WHERE o_totalprice < 50000
"""


@query("sql_session_variable", oracle=_SESSION_VAR_ORACLE)
def sql_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables (Spark 4 DECLARE VARIABLE / SET VAR): declared
    OR REPLACE for idempotence across gate invocations, set, then read
    inside a query -- parameterisation without string templating."""
    register_views(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE ushas_price_cap DOUBLE DEFAULT 0.0"
    )
    spark.sql("SET VAR ushas_price_cap = 50000.0")
    return spark.sql(
        """
SELECT CAST(COUNT(*) AS BIGINT) AS n_small
FROM orders WHERE o_totalprice < ushas_price_cap
"""
    )


_PIPE_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_x100
FROM orders
WHERE o_orderkey <= 5000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 `|>` operators, the GoogleSQL-style
    linear composition): FROM |> WHERE |> AGGREGATE ... GROUP BY
    |> ORDER BY -- a parser surface that simply does not exist in the
    reference's 2.4 grammar; the oracle is the traditional spelling."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
FROM orders
|> WHERE o_orderkey <= 5000
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_x100
   GROUP BY o_orderstatus
|> ORDER BY o_orderstatus
"""
    )


_NAMED_PARAM_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_totalprice BETWEEN 100000 AND 200000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("sql_named_parameters", oracle=_NAMED_PARAM_ORACLE)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named parameter binding (Spark 3.4+ `spark.sql(..., args=...)`
    with :name markers): values bind as literals at parse time --
    injection-safe parameterisation at the API level; oracle is the
    bound equivalent."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_totalprice BETWEEN :lo AND :hi
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
        args={"lo": 100000, "hi": 200000},
    )


_UNPIVOT_SQL = """
SELECT o_orderstatus, metric, CAST(v AS BIGINT) AS v
FROM (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
         CAST(MAX(o_orderkey) AS BIGINT) AS max_key
  FROM orders GROUP BY o_orderstatus
) t
UNPIVOT (v FOR metric IN (n_orders, n_customers, max_key))
ORDER BY o_orderstatus, metric
"""


@query("sql_unpivot_syntax", oracle=_UNPIVOT_SQL)
def sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT clause (Spark 3.4+; the parser-level dual of
    sql_pivot_syntax and the SQL spelling of melt_unpivot_api): wide
    per-status metrics rotate into (metric, value) rows -- same text
    runs on both engines."""
    return _sql(spark, sf_dir, _UNPIVOT_SQL)


_COLLATION_ORACLE = """
SELECT lower(o_orderpriority) AS priority_ci,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
              ELSE lower(o_orderpriority) END AS o_orderpriority
  FROM orders
)
GROUP BY lower(o_orderpriority)
ORDER BY priority_ci
"""


@query("sql_collation_lcase", oracle=_COLLATION_ORACLE)
def sql_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4 COLLATE UTF8_LCASE): grouping under a
    case-insensitive collation merges 'URGENT' and 'urgent' WITHOUT
    rewriting the expression -- the engine-level collation the
    reference's 2.4 binary-only comparator lacks. Mixed-case input is
    synthesised deterministically; the oracle states the lower()
    rewrite (group keys rendered lowercase so both engines emit
    identical key strings)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT lower(o_orderpriority COLLATE UTF8_LCASE) AS priority_ci,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
              ELSE lower(o_orderpriority) END AS o_orderpriority
  FROM orders
)
GROUP BY o_orderpriority COLLATE UTF8_LCASE
ORDER BY priority_ci
"""
    )


_ANSI_STR_SPARK = """
SELECT TRIM(BOTH 'x' FROM 'xxhixx')            AS trim_both,
       TRIM(LEADING ' ' FROM '  pad')          AS trim_leading,
       TRIM(TRAILING '.' FROM 'end..')         AS trim_trailing,
       CAST(POSITION('SQL' IN 'Spark SQL') AS BIGINT) AS pos_in,
       SUBSTRING('hello' FROM 2 FOR 3)         AS substr_from_for,
       OVERLAY('Spark SQL' PLACING '_' FROM 6) AS overlay_str
"""

# DuckDB has no OVERLAY; the oracle states its concat/substr expansion.
_ANSI_STR_ORACLE = _ANSI_STR_SPARK.replace(
    "OVERLAY('Spark SQL' PLACING '_' FROM 6)",
    "substr('Spark SQL', 1, 5) || '_' || substr('Spark SQL', 7)",
)


@query("sql_ansi_string_syntax", oracle=_ANSI_STR_ORACLE)
def sql_ansi_string_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI keyword-form string functions (string-functions.sql): TRIM
    BOTH/LEADING/TRAILING ... FROM, POSITION ... IN,
    SUBSTRING ... FROM ... FOR, OVERLAY ... PLACING ... FROM -- the
    grammar productions, not just the function-call spellings."""
    return _sql(spark, sf_dir, _ANSI_STR_SPARK)


_IDENTIFIER_ORACLE = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("sql_identifier_clause", oracle=_IDENTIFIER_ORACLE)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 3.5+): table and column names arrive
    as string values resolved at analysis time -- SQL-injection-safe
    templating of identifiers, absent from the 2.4 grammar; the oracle
    is the literal spelling."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT IDENTIFIER('o_orderstatus') AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n
FROM IDENTIFIER('orders')
GROUP BY IDENTIFIER('o_orderstatus')
ORDER BY o_orderstatus
"""
    )


_WITHIN_GROUP_SPARK = """
SELECT o_orderstatus,
       CAST(percentile_disc(0.5) WITHIN GROUP
            (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS median_price_x100,
       listagg(DISTINCT o_orderpriority, '|') WITHIN GROUP
            (ORDER BY o_orderpriority) AS priorities
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

_WITHIN_GROUP_ORACLE = """
SELECT o_orderstatus,
       CAST(percentile_disc(0.5) WITHIN GROUP
            (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS median_price_x100,
       string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
         AS priorities
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("sql_within_group_ordered_agg", oracle=_WITHIN_GROUP_ORACLE)
def sql_within_group_ordered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates with WITHIN GROUP (Spark 4:
    percentile_disc and LISTAGG ... WITHIN GROUP (ORDER BY), the ANSI
    ordered-aggregate grammar the 2.4 reference lacks). percentile_disc
    picks an actual member (no interpolation -- exact on integer
    inputs); listagg's DuckDB spelling is string_agg with an ORDER BY
    argument."""
    return _sql(spark, sf_dir, _WITHIN_GROUP_SPARK)


_DATE_TRUNC_BATTERY = """
SELECT CAST(CAST(date_trunc('year', o_orderdate) AS DATE) AS STRING) AS y,
       CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS STRING) AS q,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING)   AS m,
       CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS STRING)    AS w,
       CAST(CAST(date_trunc('day', o_orderdate) AS DATE) AS STRING)     AS d,
       CAST(COUNT(*) AS BIGINT)                         AS n
FROM orders
WHERE o_orderkey <= 300
GROUP BY 1, 2, 3, 4, 5
ORDER BY 1, 2, 3, 4, 5
"""


@query("sql_date_trunc_battery", oracle=_DATE_TRUNC_BATTERY)
def sql_date_trunc_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc at every calendar granularity (datetime.sql): year /
    quarter / month / ISO week (Monday start on both engines) / day,
    grouped together so boundary rows pin the truncation rules."""
    return _sql(spark, sf_dir, _DATE_TRUNC_BATTERY)


_TRY_CAST_BATTERY = """
SELECT TRY_CAST('42' AS BIGINT)        AS ok_int,
       TRY_CAST('4x2' AS BIGINT)       AS bad_int,
       TRY_CAST('3.5' AS DOUBLE)       AS ok_double,
       TRY_CAST('' AS DOUBLE)          AS empty_double,
       CAST(TRY_CAST('2020-02-30' AS DATE) AS STRING) AS bad_date,
       CAST(TRY_CAST('2020-02-29' AS DATE) AS STRING) AS leap_date,
       TRY_CAST('true' AS BOOLEAN)     AS true_bool,
       CAST(TRY_CAST('maybe' AS BOOLEAN) IS NULL AS BOOLEAN) AS bad_bool_is_null
"""


@query("sql_try_cast_battery", oracle=_TRY_CAST_BATTERY)
def sql_try_cast_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST semantics (cast.sql + ANSI mode's safe escape hatch):
    malformed numerics, impossible calendar dates and unparseable
    booleans become NULL instead of raising; valid leap-day parses.
    (Spark additionally accepts 'yes'/'no' booleans -- an engine
    extension deliberately left out of the shared battery.)"""
    return _sql(spark, sf_dir, _TRY_CAST_BATTERY)


_SUBQ_SELECT_LIST = """
SELECT n.n_name,
       CAST(EXISTS (SELECT 1 FROM supplier s
                    WHERE s.s_nationkey = n.n_nationkey) AS BOOLEAN)
         AS has_suppliers,
       CAST(n.n_nationkey IN (SELECT c_nationkey FROM customer)
            AS BOOLEAN) AS has_customers
FROM nation n
ORDER BY n.n_name
"""


@query("sql_subquery_in_select_list", oracle=_SUBQ_SELECT_LIST)
def sql_subquery_in_select_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS and IN subqueries in the SELECT LIST (not WHERE): planned
    as existence joins whose boolean lands in the projection --
    the flag-column shape (exists-subquery family / scalar positions);
    booleans are always TRUE/FALSE here (never NULL: EXISTS is
    two-valued and the IN probe key is non-null), so the cross-engine
    rendering is stable."""
    return _sql(spark, sf_dir, _SUBQ_SELECT_LIST)


_ROW_VALUE_CMP = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_after_cursor,
       CAST(SUM(CASE WHEN (o_custkey, o_orderkey)
                     IN ((CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
                         (CAST(2 AS BIGINT), CAST(7 AS BIGINT)))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_tuple_in
FROM orders
WHERE (o_custkey, o_orderkey) > (CAST(750 AS BIGINT), CAST(0 AS BIGINT))
"""


@query("sql_row_value_comparison", oracle=_ROW_VALUE_CMP)
def sql_row_value_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-value (tuple) comparisons: lexicographic (a, b) > (x, y) --
    the KEYSET-PAGINATION predicate every cursor API builds on (resume
    after a composite key without OR-chains) -- plus tuple IN over
    composite literals. Same semantics both engines."""
    return _sql(spark, sf_dir, _ROW_VALUE_CMP)


_COMPAT_SPARK = """
SELECT ifnull(NULL, 'x')                        AS c_ifnull_null,
       ifnull('y', 'x')                         AS c_ifnull_val,
       nullif('x', 'x')                         AS c_nullif_eq,
       nullif('x', 'y')                         AS c_nullif_ne,
       nvl(NULL, 'x')                           AS c_nvl_null,
       nvl('y', 'x')                            AS c_nvl_val,
       nvl2(NULL, 'x', 'y')                     AS c_nvl2_null,
       nvl2('n', 'x', 'y')                      AS c_nvl2_val,
       CAST(ifnull(1, 2.5D) AS DOUBLE)          AS c_ifnull_coerce,
       CAST(nullif(1, 1.0D) AS DOUBLE)          AS c_nullif_num_eq,
       CAST(nvl(NULL, 2.5D) AS DOUBLE)          AS c_nvl_coerce,
       boolean(1)                               AS c_bool,
       CAST(tinyint(1) AS BIGINT)               AS c_tinyint,
       CAST(smallint(1) AS BIGINT)              AS c_smallint,
       CAST(int(1) AS BIGINT)                   AS c_int,
       bigint(1)                                AS c_bigint,
       CAST(float(1) AS DOUBLE)                 AS c_float,
       double(1)                                AS c_double,
       CAST(date('2014-04-04') AS STRING)       AS c_date,
       CAST(timestamp(date('2014-04-04')) AS STRING) AS c_timestamp
"""

_COMPAT_ORACLE = """
SELECT ifnull(NULL, 'x')                        AS c_ifnull_null,
       ifnull('y', 'x')                         AS c_ifnull_val,
       nullif('x', 'x')                         AS c_nullif_eq,
       nullif('x', 'y')                         AS c_nullif_ne,
       ifnull(NULL, 'x')                        AS c_nvl_null,
       ifnull('y', 'x')                         AS c_nvl_val,
       CASE WHEN NULL IS NOT NULL THEN 'x' ELSE 'y' END AS c_nvl2_null,
       CASE WHEN 'n' IS NOT NULL THEN 'x' ELSE 'y' END  AS c_nvl2_val,
       CAST(ifnull(1, 2.5) AS DOUBLE)           AS c_ifnull_coerce,
       CAST(nullif(1, 1.0) AS DOUBLE)           AS c_nullif_num_eq,
       CAST(ifnull(NULL, 2.5) AS DOUBLE)        AS c_nvl_coerce,
       CAST(1 AS BOOLEAN)                       AS c_bool,
       CAST(CAST(1 AS TINYINT) AS BIGINT)       AS c_tinyint,
       CAST(CAST(1 AS SMALLINT) AS BIGINT)      AS c_smallint,
       CAST(CAST(1 AS INTEGER) AS BIGINT)       AS c_int,
       CAST(1 AS BIGINT)                        AS c_bigint,
       CAST(CAST(1 AS FLOAT) AS DOUBLE)         AS c_float,
       CAST(1 AS DOUBLE)                        AS c_double,
       strftime(DATE '2014-04-04', '%Y-%m-%d')  AS c_date,
       strftime(CAST(DATE '2014-04-04' AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS c_timestamp
"""


@query("sql_compat_functions", oracle=_COMPAT_ORACLE)
def sql_compat_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-database compatibility functions
    (sql-compatibility-functions.sql): the RuntimeReplaceable family
    ifnull / nullif / nvl / nvl2 with null and non-null operands plus
    their numeric type-coercion forms, and the SPARK-16730 Hive cast
    aliases boolean()/tinyint()/.../double()/date()/timestamp(). The
    oracle spells nvl/nvl2 and the cast aliases in portable ANSI
    (ifnull / CASE / CAST) -- the semantics under test are Spark's
    rewrites to exactly those forms."""
    return _sql(spark, sf_dir, _COMPAT_SPARK)


def _join_empty_case(label: str, left: str, jt: str, right: str, cond: str) -> str:
    return (
        f"SELECT '{label}' AS case_name, CAST(COUNT(*) AS BIGINT) AS n_rows "
        f"FROM (SELECT * FROM {left} {jt} JOIN {right} {cond})"
    )


def _join_empty_sql(semi: str, anti: str) -> str:
    """The 21-cell join-vs-empty-relation matrix (join-empty-relation.sql):
    every join type against an empty right side, an empty left side, and
    empty on both sides, reduced to row counts."""
    cases = []
    for side, l, r in (("t1_empty", "t1", "e1"), ("empty_t1", "e1", "t1"),
                       ("empty_empty", "e1", "e2")):
        for jt in ("INNER", "CROSS", "LEFT OUTER", "RIGHT OUTER",
                   "FULL OUTER"):
            cond = "ON l.a = r.a" if jt != "CROSS" else ""
            cases.append(_join_empty_case(
                f"{side}_{jt.lower().replace(' ', '_')}",
                f"{l} l", jt, f"{r} r", cond))
        cases.append(_join_empty_case(f"{side}_semi", f"{l} l", semi,
                                      f"{r} r", "ON l.a = r.a"))
        cases.append(_join_empty_case(f"{side}_anti", f"{l} l", anti,
                                      f"{r} r", "ON l.a = r.a"))
    return (
        "WITH t1 AS (SELECT 1 AS a),\n"
        "e1 AS (SELECT a FROM t1 WHERE false),\n"
        "e2 AS (SELECT a FROM t1 WHERE false)\n"
        + "\nUNION ALL\n".join(cases)
        + "\nORDER BY case_name"
    )


@query("sql_join_empty_relation", oracle=_join_empty_sql("SEMI", "ANTI"))
def sql_join_empty_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-vs-empty-relation semantics (join-empty-relation.sql): all 7
    join types x {empty right, empty left, both empty} as a 21-row
    count matrix -- LEFT OUTER against empty keeps the left row,
    RIGHT OUTER against an empty left keeps the right row, ANTI against
    empty passes everything, SEMI against empty passes nothing. Spark
    spells semi/anti as LEFT SEMI / LEFT ANTI; DuckDB as SEMI / ANTI --
    same plans, same counts."""
    return _sql(spark, sf_dir, _join_empty_sql("LEFT SEMI", "LEFT ANTI"))
