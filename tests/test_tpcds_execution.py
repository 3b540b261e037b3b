"""TPC-DS EXECUTION sample: run real TPC-DS queries end-to-end on
deterministic synthetic data and require value-exact agreement with
DuckDB executing the IDENTICAL SQL.

test_benchmark_suites.py proves all 169 public TPC-DS/SSB queries parse,
analyze, physical-plan, and walk through the lineage extractor; this
suite goes one step further than the reference itself (whose
TPCDSQuerySuite is compile-only) for a representative sample: the
star-join + rollup + ordered-limit shapes of q3 / q42 / q52 / q55 and
the multi-dim count of q96 execute over populated tables, and both
engines must produce identical rows.

Synthetic data is generated from pure arithmetic on the row index
(FK cycles cover every dimension key; named overrides guarantee the
queries' filter constants -- d_moy = 11, i_manufact_id = 128,
i_manager_id in {1, 28}, t_hour = 20, hd_dep_count = 7,
s_store_name = 'ese' -- select real rows), so the fixture is
deterministic, engine-neutral, and regenerates bit-identically.
"""

from __future__ import annotations

import os
import re

import duckdb
import pandas as pd
import pytest

from tests.oracle_harness import compare_frames

REF_SUITE = (
    "/root/reference/sql/core/src/test/scala/org/apache/spark/sql/"
    "TPCDSQuerySuite.scala"
)
RES = "/root/reference/sql/core/src/test/resources/tpcds"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference resources not available"
)

QUERIES = ["q3", "q42", "q52", "q55", "q96"]
TABLES = {
    "date_dim": 120,
    "item": 60,
    "time_dim": 60,
    "household_demographics": 60,
    "store": 60,
    "store_sales": 6000,
}

# Named generators: i is the 0-based row index. Everything not listed
# falls to the generic rules (PK = i+1, FK cycles, arithmetic values).
SPECIAL = {
    "d_year": lambda i: 1998 + (i // 12) % 5,
    "d_moy": lambda i: 1 + i % 12,
    "d_dom": lambda i: 1 + i % 28,
    "i_manufact_id": lambda i: 100 + i % 50,   # covers q3's 128
    "i_manager_id": lambda i: 1 + i % 30,      # covers 1 and 28 (x2 each)
    "i_brand_id": lambda i: 1 + i % 15,
    "i_brand": lambda i: f"brand_{i % 15}",
    "i_category_id": lambda i: 1 + i % 8,
    "i_category": lambda i: f"cat_{i % 8}",
    "t_hour": lambda i: i % 24,                # covers q96's 20
    "t_minute": lambda i: i % 60,
    "hd_dep_count": lambda i: i % 10,          # covers q96's 7
    "s_store_name": lambda i: "ese" if i % 3 == 0 else f"store_{i}",
}

_PK = {
    "date_dim": "d_date_sk",
    "item": "i_item_sk",
    "time_dim": "t_time_sk",
    "household_demographics": "hd_demo_sk",
    "store": "s_store_sk",
}


def _ddl_columns() -> dict[str, list[tuple[str, str]]]:
    """(table -> [(col, type)]) parsed from the reference suite DDL."""
    with open(REF_SUITE, encoding="utf-8") as fh:
        src = fh.read()
    out: dict[str, list[tuple[str, str]]] = {}
    for block in re.findall(r'"""(.*?)"""', src, flags=re.DOTALL):
        text = " ".join(
            line.split("|", 1)[1] if "|" in line else line
            for line in block.splitlines()
        )
        m = re.match(r"\s*CREATE TABLE `(\w+)` \((.*)\)\s*USING parquet", text)
        if not m or m.group(1) not in TABLES:
            continue
        cols = re.findall(r"`(\w+)`\s+([A-Z]+(?:\(\d+,\d+\))?)", m.group(2))
        out[m.group(1)] = cols
    assert set(out) == set(TABLES), f"missing DDL for {set(TABLES) - set(out)}"
    return out


def _mix(i: int, col: str) -> int:
    seed = sum((j + 1) * ord(c) for j, c in enumerate(col))
    h = ((i + seed) * 2654435761) % 2**32
    h ^= h >> 15
    h = (h * 2246822519) % 2**32
    h ^= h >> 13
    return h


def _gen_cell(table: str, col: str, typ: str, i: int):
    if col in SPECIAL:
        return SPECIAL[col](i)
    if col == _PK.get(table):
        return i + 1
    if col.endswith("_sk"):
        # FK = deterministic integer mix of (row, column): linear-stride
        # schemes make every FK a function of i mod |dim|, so FK PAIRS
        # co-occur in only |dim| fixed combinations and conjunctive
        # filters (a specific date AND a specific item) can be
        # structurally unsatisfiable. The mix decorrelates pairs; the
        # fixture is sized so each query's filter conjunction is
        # populated (asserted below -- and deterministic, so checked
        # once is checked forever).
        size = 120 if col.endswith("_date_sk") else 60
        return 1 + _mix(i, col) % size
    t = typ.upper()
    if t.startswith("DECIMAL"):
        # Distinct-ish cents so ordered-limit boundaries never tie.
        return round(((i * 137 + len(col) * 997) % 99991) / 100.0, 2)
    if t in ("INT", "BIGINT", "SMALLINT"):
        return (i * 7 + len(col)) % 100
    if t == "DATE":
        return pd.Timestamp("1998-01-01") + pd.Timedelta(days=(i % 1825))
    if t == "STRING":
        return f"{col}_{i % 20}"
    if t == "DOUBLE":
        return ((i * 31 + len(col)) % 1000) / 10.0
    raise AssertionError(f"unhandled type {typ} for {table}.{col}")


@pytest.fixture(scope="module")
def tpcds_data(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tpcds_exec")
    cols_by_table = _ddl_columns()
    paths = {}
    for table, n in TABLES.items():
        cols = cols_by_table[table]
        data = {
            col: [_gen_cell(table, col, typ, i) for i in range(n)]
            for col, typ in cols
        }
        pdf = pd.DataFrame(data)
        for col, typ in cols:
            if typ.upper() == "DATE":
                pdf[col] = pd.to_datetime(pdf[col])
        path = str(root / f"{table}.parquet")
        pdf.to_parquet(path)
        paths[table] = path
        spark.read.parquet(path).createOrReplaceTempView(table)
    yield paths
    for table in TABLES:
        spark.catalog.dropTempView(table)


def _positional(pdf: pd.DataFrame) -> pd.DataFrame:
    # Engines name unaliased aggregates differently (count_star() vs
    # count(1)); results are compared by POSITION, values exactly.
    out = pdf.copy()
    out.columns = [f"c{j}" for j in range(len(pdf.columns))]
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_tpcds_query_executes_exactly(spark, tpcds_data, name):
    with open(os.path.join(RES, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    spark_pdf = spark.sql(sql).toPandas()
    con = duckdb.connect()
    try:
        for table, path in tpcds_data.items():
            con.execute(
                f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}')"
            )
        duck_pdf = con.execute(sql).fetchdf()
    finally:
        con.close()
    assert len(spark_pdf) > 0, f"{name}: empty result -- fixture too sparse"
    problems = compare_frames(_positional(spark_pdf), _positional(duck_pdf))
    assert not problems, f"{name}: " + "; ".join(problems)
