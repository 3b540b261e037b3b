"""Catalog / DDL-metadata SQL conformance (reference sql-tests inputs).

Covers the reference's catalog-surface input files that have no DuckDB
oracle because their output is engine-specific metadata, modeled on:
  sql/core/src/test/resources/sql-tests/inputs/describe.sql
  sql/core/src/test/resources/sql-tests/inputs/show-tables.sql
  sql/core/src/test/resources/sql-tests/inputs/show_columns.sql
  sql/core/src/test/resources/sql-tests/inputs/change-column.sql
  sql/core/src/test/resources/sql-tests/inputs/columnresolution.sql
  sql/core/src/test/resources/sql-tests/inputs/table-valued-functions.sql
  sql/core/src/test/resources/sql-tests/inputs/tablesample-negative.sql

Golden-shape strategy: assert the column sets, key metadata rows, and
error classes Spark produces, not byte-exact strings (those differ
across Spark versions by design; the reference regenerates its .out
files per version the same way).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException, ParseException


@pytest.fixture(scope="module")
def cat(spark):
    """A throwaway database holding this module's tables."""
    db = f"catconf_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    yield db
    spark.sql("USE default")
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


# --------------------------------------------------------------------------
# describe.sql


def test_describe_partitioned_table(spark, cat):
    t = f"{cat}.desc_t"
    spark.sql(
        f"CREATE TABLE {t} (a STRING, b INT, c STRING, d STRING) USING parquet "
        "PARTITIONED BY (c, d) COMMENT 'table_comment' TBLPROPERTIES (t = 'test')"
    )
    try:
        spark.sql(f"ALTER TABLE {t} ADD PARTITION (c='Us', d='1')")

        desc = spark.sql(f"DESCRIBE {t}")
        assert desc.columns == ["col_name", "data_type", "comment"]
        rows = {r.col_name: r.data_type for r in desc.collect()}
        assert rows["a"] == "string" and rows["b"] == "int"
        # Partition columns are repeated under the partition-info banner.
        assert "# Partition Information" in rows

        # DESC / DESC TABLE / DESC FORMATTED / DESC EXTENDED parse variants.
        for stmt in (f"DESC {t}", f"DESC TABLE {t}", f"DESC FORMATTED {t}",
                     f"DESC EXTENDED {t}"):
            assert spark.sql(stmt).columns == ["col_name", "data_type", "comment"]

        ext = {r.col_name: r.data_type for r in spark.sql(f"DESC EXTENDED {t}").collect()}
        assert "# Detailed Table Information" in ext
        assert ext.get("Comment") == "table_comment"

        # TBLPROPERTIES set/unset round-trips through DESC EXTENDED.
        spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES (e = '3')")
        props = {r.col_name: r.data_type for r in spark.sql(f"DESC EXTENDED {t}").collect()}
        assert "e=3" in props.get("Table Properties", "")
        spark.sql(f"ALTER TABLE {t} UNSET TBLPROPERTIES (e)")
        props = {r.col_name: r.data_type for r in spark.sql(f"DESC EXTENDED {t}").collect()}
        assert "e=3" not in props.get("Table Properties", "")

        # DESC ... PARTITION on an existing partition.
        part = spark.sql(f"DESC {t} PARTITION (c='Us', d='1')")
        assert part.columns == ["col_name", "data_type", "comment"]

        # Error cases from the reference file.
        with pytest.raises(AnalysisException):  # partition not found
            spark.sql(f"DESC {t} PARTITION (c='Us', d='2')").collect()
        with pytest.raises(AnalysisException):  # incomplete partition spec
            spark.sql(f"DESC {t} PARTITION (c='Us')").collect()
        with pytest.raises((AnalysisException, ParseException)):  # key w/o value
            spark.sql(f"DESC {t} PARTITION (c='Us', d)").collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_describe_views(spark, cat):
    t = f"{cat}.desc_vt"
    spark.sql(f"CREATE TABLE {t} (a STRING, b INT) USING parquet")
    spark.sql(f"CREATE TEMPORARY VIEW desc_temp_v AS SELECT * FROM {t}")
    spark.sql(f"CREATE VIEW {cat}.desc_v AS SELECT * FROM {t}")
    try:
        for v in ("desc_temp_v", f"{cat}.desc_v"):
            rows = {r.col_name: r.data_type for r in spark.sql(f"DESC {v}").collect()}
            assert rows == {"a": "string", "b": "int"}
        # DESC PARTITION is not allowed on (temp) views.
        with pytest.raises(AnalysisException):
            spark.sql("DESC desc_temp_v PARTITION (c='Us')").collect()
        with pytest.raises(AnalysisException):
            spark.sql(f"DESC {cat}.desc_v PARTITION (c='Us')").collect()
    finally:
        spark.sql("DROP VIEW IF EXISTS desc_temp_v")
        spark.sql(f"DROP VIEW IF EXISTS {cat}.desc_v")
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_describe_table_column(spark, cat):
    """describe-table-column.sql: DESC table colname shape."""
    t = f"{cat}.desc_col_t"
    spark.sql(f"CREATE TABLE {t} (a INT COMMENT 'col a', b STRING) USING parquet")
    try:
        got = spark.sql(f"DESCRIBE {t} a")
        pairs = {r.info_name: r.info_value for r in got.collect()}
        assert pairs["col_name"] == "a"
        assert pairs["data_type"] == "int"
        assert pairs["comment"] == "col a"
        with pytest.raises(AnalysisException):
            spark.sql(f"DESCRIBE {t} no_such_col").collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# --------------------------------------------------------------------------
# show-tables.sql


def test_show_tables(spark, cat):
    spark.sql(f"CREATE TABLE {cat}.show_t1 (a STRING, b INT) USING parquet")
    spark.sql(f"CREATE TABLE {cat}.show_t2 (b STRING, d INT) USING parquet")
    spark.sql("CREATE TEMPORARY VIEW show_t3 AS SELECT 1 AS e")
    try:
        df = spark.sql(f"SHOW TABLES IN {cat}")
        assert df.columns == ["namespace", "tableName", "isTemporary"]
        names = {r.tableName for r in df.collect()}
        # Temp views are listed alongside the database's tables.
        assert {"show_t1", "show_t2", "show_t3"} <= names

        spark.sql(f"USE {cat}")
        try:
            cur = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
            assert {"show_t1", "show_t2"} <= cur
            # Wildcard / LIKE / alternation forms.
            assert {r.tableName for r in spark.sql("SHOW TABLES 'show_t*'").collect()} \
                >= {"show_t1", "show_t2"}
            assert {r.tableName
                    for r in spark.sql("SHOW TABLES LIKE 'show_t1*|show_t2*'").collect()} \
                == {"show_t1", "show_t2"}
            assert {r.tableName
                    for r in spark.sql(f"SHOW TABLES IN {cat} 'show_t1'").collect()} \
                == {"show_t1"}
        finally:
            spark.sql("USE default")

        # SHOW TABLE EXTENDED carries the metadata blob column.
        ext = spark.sql(f"SHOW TABLE EXTENDED IN {cat} LIKE 'show_t*'")
        assert ext.columns == ["namespace", "tableName", "isTemporary", "information"]
        infos = {r.tableName: r.information for r in ext.collect()}
        assert "Table: show_t1" in infos["show_t1"]
        # Table name is mandatory for EXTENDED.
        with pytest.raises(ParseException):
            spark.sql("SHOW TABLE EXTENDED")
    finally:
        spark.sql("DROP VIEW IF EXISTS show_t3")
        spark.sql(f"DROP TABLE IF EXISTS {cat}.show_t1")
        spark.sql(f"DROP TABLE IF EXISTS {cat}.show_t2")


def test_show_table_extended_partition(spark, cat):
    t = f"{cat}.show_pt"
    spark.sql(
        f"CREATE TABLE {t} (a STRING, c STRING, d STRING) USING parquet "
        "PARTITIONED BY (c, d)"
    )
    try:
        spark.sql(f"ALTER TABLE {t} ADD PARTITION (c='Us', d='1')")
        ok = spark.sql(
            f"SHOW TABLE EXTENDED IN {cat} LIKE 'show_pt' PARTITION (c='Us', d='1')"
        )
        rows = ok.collect()
        assert len(rows) == 1 and "Partition Values" in rows[0].information
        # Incomplete / invalid / missing partition specs raise.
        with pytest.raises(AnalysisException):
            spark.sql(
                f"SHOW TABLE EXTENDED IN {cat} LIKE 'show_pt' PARTITION (c='Us')"
            ).collect()
        with pytest.raises(AnalysisException):
            spark.sql(
                f"SHOW TABLE EXTENDED IN {cat} LIKE 'show_pt' PARTITION (a='Us', d='1')"
            ).collect()
        with pytest.raises(AnalysisException):
            spark.sql(
                f"SHOW TABLE EXTENDED IN {cat} LIKE 'show_pt' PARTITION (c='Ch', d='1')"
            ).collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# --------------------------------------------------------------------------
# show_columns.sql


def test_show_columns(spark, cat):
    spark.sql(f"CREATE TABLE {cat}.showcolumn1 (col1 INT, `col 2` INT) USING parquet")
    spark.sql(
        f"CREATE TABLE {cat}.showcolumn2 (price INT, qty INT, year INT, month INT) "
        "USING parquet PARTITIONED BY (year, month)"
    )
    spark.sql("CREATE TEMPORARY VIEW showcolumn3 AS SELECT 1 AS col3, 2 AS `col 4`")
    spark.sql("CREATE GLOBAL TEMP VIEW showcolumn4 AS SELECT 1 AS col1, 'abc' AS `col 5`")
    try:
        df = spark.sql(f"SHOW COLUMNS IN {cat}.showcolumn1")
        assert df.columns == ["col_name"]
        assert [r.col_name for r in df.collect()] == ["col1", "col 2"]
        # table name + database name form; partition columns included.
        assert [r.col_name
                for r in spark.sql(f"SHOW COLUMNS IN showcolumn2 FROM {cat}").collect()] \
            == ["price", "qty", "year", "month"]
        # Non-existent table raises.
        with pytest.raises(AnalysisException):
            spark.sql(f"SHOW COLUMNS IN badtable FROM {cat}").collect()
        # Database in identifier and FROM clause must agree.
        with pytest.raises(AnalysisException):
            spark.sql(f"SHOW COLUMNS IN {cat}.showcolumn1 FROM baddb").collect()
        # Temp view: unqualified OK.
        assert [r.col_name for r in spark.sql("SHOW COLUMNS IN showcolumn3").collect()] \
            == ["col3", "col 4"]
        # Global temp view must be qualified with its special database.
        assert [r.col_name
                for r in spark.sql("SHOW COLUMNS IN global_temp.showcolumn4").collect()] \
            == ["col1", "col 5"]
        assert [r.col_name
                for r in spark.sql("SHOW COLUMNS IN showcolumn4 FROM global_temp").collect()] \
            == ["col1", "col 5"]
    finally:
        spark.sql("DROP VIEW IF EXISTS showcolumn3")
        spark.sql("DROP VIEW IF EXISTS global_temp.showcolumn4")
        spark.sql(f"DROP TABLE IF EXISTS {cat}.showcolumn1")
        spark.sql(f"DROP TABLE IF EXISTS {cat}.showcolumn2")


# --------------------------------------------------------------------------
# change-column.sql (v1 parquet tables: comment changes are supported;
# rename / retype / reposition are not on the v1 path)


def test_change_column(spark, cat):
    t = f"{cat}.test_change"
    spark.sql(f"CREATE TABLE {t} (a INT, b STRING, c INT) USING parquet")
    try:
        # Comment changes land and show up in DESC.
        spark.sql(f"ALTER TABLE {t} CHANGE a a INT COMMENT 'this is column a'")
        spark.sql(f"ALTER TABLE {t} CHANGE b b STRING COMMENT '#*02?`'")
        rows = {r.col_name: r.comment for r in spark.sql(f"DESC {t}").collect()}
        assert rows["a"] == "this is column a"
        assert rows["b"] == "#*02?`"
        # Idempotent re-apply is fine.
        spark.sql(f"ALTER TABLE {t} CHANGE a a INT COMMENT 'this is column a'")
        # Type change is not supported for v1 parquet tables.
        with pytest.raises(AnalysisException):
            spark.sql(f"ALTER TABLE {t} CHANGE a a STRING")
        # Unknown column raises.
        with pytest.raises(AnalysisException):
            spark.sql(f"ALTER TABLE {t} CHANGE invalid_col invalid_col INT")
        # Temp / global-temp views cannot be ALTERed.
        spark.sql("CREATE TEMPORARY VIEW chg_temp_view(a, b) AS SELECT 1, 'one'")
        with pytest.raises(AnalysisException):
            spark.sql("ALTER TABLE chg_temp_view CHANGE a a INT COMMENT 'x'")
        spark.sql("DROP VIEW chg_temp_view")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# --------------------------------------------------------------------------
# columnresolution.sql — qualified names resolve through db.table.column


def test_column_resolution_qualified(spark):
    db1 = f"crdb1_{uuid.uuid4().hex[:6]}"
    db2 = f"crdb2_{uuid.uuid4().hex[:6]}"
    spark.sql(f"CREATE DATABASE {db1}")
    spark.sql(f"CREATE DATABASE {db2}")
    try:
        spark.sql(f"CREATE TABLE {db1}.t1 USING parquet AS SELECT 1 AS i1")
        spark.sql(f"CREATE TABLE {db2}.t1 USING parquet AS SELECT 20 AS i1")
        spark.sql(f"USE {db1}")
        # Unqualified, table-qualified, and db.table.column-qualified forms.
        assert spark.sql("SELECT i1 FROM t1").collect()[0][0] == 1
        assert spark.sql("SELECT t1.i1 FROM t1").collect()[0][0] == 1
        assert spark.sql(f"SELECT {db1}.t1.i1 FROM t1").collect()[0][0] == 1
        assert spark.sql(f"SELECT {db1}.t1.i1 FROM {db1}.t1").collect()[0][0] == 1
        # From the other database the same text resolves to db1's table.
        spark.sql(f"USE {db2}")
        assert spark.sql("SELECT i1 FROM t1").collect()[0][0] == 20
        assert spark.sql(f"SELECT i1 FROM {db1}.t1").collect()[0][0] == 1
        assert spark.sql(f"SELECT {db1}.t1.i1 FROM {db1}.t1").collect()[0][0] == 1
        # Star expansion with qualified prefixes.
        spark.sql(f"USE {db1}")
        assert spark.sql("SELECT t1.* FROM t1").columns == ["i1"]
        assert spark.sql(f"SELECT {db1}.t1.* FROM {db1}.t1").columns == ["i1"]
        assert spark.sql(f"SELECT t1.* FROM {db1}.t1").columns == ["i1"]
        assert spark.sql(f"SELECT a.* FROM {db1}.t1 AS a").columns == ["i1"]
        # Correlated subquery with fully-qualified correlation names.
        spark.sql(
            f"CREATE TABLE {db1}.t3 USING parquet AS "
            "SELECT * FROM VALUES (4,1), (3,1) AS t3(c1, c2)"
        )
        spark.sql(
            f"CREATE TABLE {db1}.t4 USING parquet AS "
            "SELECT * FROM VALUES (4,1), (2,1) AS t4(c2, c3)"
        )
        got = spark.sql(
            f"SELECT * FROM {db1}.t3 WHERE c1 IN "
            f"(SELECT {db1}.t4.c2 FROM {db1}.t4 WHERE {db1}.t4.c3 = {db1}.t3.c2)"
        ).collect()
        assert [(r.c1, r.c2) for r in got] == [(4, 1)]
    finally:
        spark.sql("USE default")
        spark.sql(f"DROP DATABASE IF EXISTS {db1} CASCADE")
        spark.sql(f"DROP DATABASE IF EXISTS {db2} CASCADE")


def test_column_resolution_struct(spark, cat):
    """A column named like its table: t5.t5.i1 picks the struct field."""
    t = f"{cat}.t5"
    spark.sql(f"CREATE TABLE {t} (i1 INT, t5 STRUCT<i1:INT, i2:INT>) USING parquet")
    try:
        spark.sql(f"INSERT INTO {t} VALUES (1, named_struct('i1', 2, 'i2', 3))")
        assert spark.sql(f"SELECT t5.i1 FROM {t}").collect()[0][0] == 1
        assert spark.sql(f"SELECT t5.t5.i1 FROM {t}").collect()[0][0] == 2
        assert spark.sql(f"SELECT t5.t5.i2 FROM {t}").collect()[0][0] == 3
        assert spark.sql(f"SELECT t5.t5.* FROM {t}").columns == ["i1", "i2"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# --------------------------------------------------------------------------
# table-valued-functions.sql


def test_table_valued_range_variants(spark):
    # range(end) with a non-integral expression is cast to long.
    assert spark.sql("SELECT * FROM range(6 + cos(3))").count() == 5
    assert [r.id for r in spark.sql("SELECT * FROM range(5, 10)").collect()] \
        == [5, 6, 7, 8, 9]
    assert [r.id for r in spark.sql("SELECT * FROM range(0, 10, 2) ORDER BY id").collect()] \
        == [0, 2, 4, 6, 8]
    # numPartitions argument is honored.
    df = spark.sql("SELECT * FROM range(0, 10, 1, 7)")
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 10
    # Mixed-case function name resolves.
    assert spark.sql("SELECT * FROM RaNgE(2)").count() == 2
    # Arity error and null argument raise.
    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM range(1, 1, 1, 1, 1)")
    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM range(1, null)")
    # Unresolved TVF raises.
    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM dummy(3)")
    # TVFs compose with joins.
    assert spark.sql("SELECT * FROM range(3) a CROSS JOIN range(3) b").count() == 9
    # Generator TVFs in the FROM clause (explode / inline).
    assert [r.col for r in spark.sql("SELECT * FROM explode(array(10, 20))").collect()] \
        == [10, 20]
    got = spark.sql(
        "SELECT * FROM inline(array(struct(1, 'a'), struct(2, 'b')))"
    ).collect()
    assert [(r.col1, r.col2) for r in got] == [(1, "a"), (2, "b")]


# --------------------------------------------------------------------------
# TABLESAMPLE grammar (tablesample-negative.sql + SqlBase.g4 sampledRelation)


def test_tablesample_percent_repeatable(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("ts_orders")
    try:
        n = spark.table("ts_orders").count()
        q = "SELECT o_orderkey FROM ts_orders TABLESAMPLE (25 PERCENT) REPEATABLE (7)"
        a = sorted(r.o_orderkey for r in spark.sql(q).collect())
        b = sorted(r.o_orderkey for r in spark.sql(q).collect())
        # Seeded Bernoulli sample: deterministic for a fixed input layout,
        # row count near 25% (loose bounds — it samples per-row).
        assert a == b
        assert 0.10 * n < len(a) < 0.40 * n
        # BUCKET x OUT OF y grammar form.
        q2 = ("SELECT o_orderkey FROM ts_orders "
              "TABLESAMPLE (BUCKET 1 OUT OF 4) REPEATABLE (7)")
        c = spark.sql(q2).count()
        assert 0.10 * n < c < 0.40 * n
        # n ROWS form is an exact limit.
        assert spark.sql(
            "SELECT o_orderkey FROM ts_orders TABLESAMPLE (5 ROWS)"
        ).count() == 5
    finally:
        spark.catalog.dropTempView("ts_orders")


def test_tablesample_negative(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("ts_neg")
    try:
        with pytest.raises((AnalysisException, ParseException)):
            spark.sql("SELECT * FROM ts_neg TABLESAMPLE (-1 PERCENT)").collect()
        with pytest.raises((AnalysisException, ParseException)):
            spark.sql("SELECT * FROM ts_neg TABLESAMPLE (101 PERCENT)").collect()
    finally:
        spark.catalog.dropTempView("ts_neg")


# --------------------------------------------------------------------------
# columnresolution-negative.sql — ambiguous / invalid qualified references


def test_column_resolution_negative(spark):
    db = f"crneg_{uuid.uuid4().hex[:6]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        spark.sql(f"CREATE TABLE {db}.t1 USING parquet AS SELECT 1 AS i1")
        spark.sql(f"USE {db}")
        # Self-join without aliases: every reference form is ambiguous.
        for sel in ("i1", "t1.i1", f"{db}.t1.i1"):
            with pytest.raises(AnalysisException):
                spark.sql(f"SELECT {sel} FROM t1, {db}.t1").collect()
        # A table name is not a column; deep paths into non-structs fail.
        with pytest.raises(AnalysisException):
            spark.sql(f"SELECT {db}.t1 FROM t1").collect()
        with pytest.raises(AnalysisException):
            spark.sql("SELECT t1.x.y.* FROM t1").collect()
        with pytest.raises(AnalysisException):
            spark.sql("SELECT t1 FROM t1").collect()
        # A db-qualified reference to a table NOT in the FROM clause fails.
        with pytest.raises(AnalysisException):
            spark.sql(f"SELECT {db}.t1.i1 FROM t1 AS x").collect()
    finally:
        spark.sql("USE default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


# --------------------------------------------------------------------------
# describe-part-after-analyze.sql — per-partition stats land in DESC EXTENDED


def test_describe_partition_after_analyze(spark, cat):
    t = f"{cat}.part_stats_t"
    spark.sql(
        f"CREATE TABLE {t} (key STRING, value STRING, ds STRING, hr INT) "
        "USING parquet PARTITIONED BY (ds, hr)"
    )
    try:
        spark.sql(
            f"INSERT INTO TABLE {t} PARTITION (ds='2017-08-01', hr=10) "
            "VALUES ('k1', '100'), ('k2', '200'), ('k3', '300')"
        )
        spark.sql(
            f"INSERT INTO TABLE {t} PARTITION (ds='2017-08-01', hr=11) "
            "VALUES ('k1', '101'), ('k2', '201'), ('k3', '301'), ('k4', '401')"
        )

        def part_info(hr: int) -> dict:
            rows = spark.sql(
                f"DESC EXTENDED {t} PARTITION (ds='2017-08-01', hr={hr})"
            ).collect()
            return {r.col_name: r.data_type for r in rows}

        # Before ANALYZE: no Partition Statistics row.
        assert "Partition Statistics" not in part_info(10)
        spark.sql(
            f"ANALYZE TABLE {t} PARTITION (ds='2017-08-01', hr=10) "
            "COMPUTE STATISTICS"
        )
        stats10 = part_info(10)
        assert "Partition Statistics" in stats10
        assert "3 rows" in stats10["Partition Statistics"]
        # The other partition stays un-analyzed until the wildcard run.
        assert "Partition Statistics" not in part_info(11)
        spark.sql(
            f"ANALYZE TABLE {t} PARTITION (ds='2017-08-01') COMPUTE STATISTICS"
        )
        assert "4 rows" in part_info(11)["Partition Statistics"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# --------------------------------------------------------------------------
# columnresolution-views.sql — qualified column names through views


def test_column_resolution_views(spark):
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW crview1 AS SELECT 2 AS i1")
    spark.sql("CREATE OR REPLACE GLOBAL TEMPORARY VIEW crview2 AS SELECT 1 AS i1")
    try:
        for q in ("SELECT crview1.* FROM crview1",
                  "SELECT * FROM crview1",
                  "SELECT crview1.i1 FROM crview1",
                  "SELECT i1 FROM crview1",
                  "SELECT a.i1 FROM crview1 AS a",
                  "SELECT i1 FROM crview1 AS a"):
            assert spark.sql(q).collect()[0][0] == 2, q
        for q in ("SELECT * FROM global_temp.crview2",
                  "SELECT global_temp.crview2.* FROM global_temp.crview2",
                  "SELECT i1 FROM global_temp.crview2",
                  "SELECT global_temp.crview2.i1 FROM global_temp.crview2",
                  "SELECT crview2.i1 FROM global_temp.crview2",
                  "SELECT a.i1 FROM global_temp.crview2 AS a",
                  "SELECT i1 FROM global_temp.crview2 AS a"):
            assert spark.sql(q).collect()[0][0] == 1, q
    finally:
        spark.sql("DROP VIEW IF EXISTS crview1")
        spark.sql("DROP VIEW IF EXISTS global_temp.crview2")
