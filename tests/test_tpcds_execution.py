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

QUERIES = [
    "q3", "q19", "q42", "q52", "q55", "q96",
    # Round 5: the store_sales star family whose aggregates are
    # group-count / small-group-sum shaped (exact across engines).
    "q34",  # ticket-size buckets per customer, HAVING BETWEEN
    "q43",  # day-of-week pivot sums per store
    "q46",  # cross-city purchases, multi-dim group
    "q68",  # like q46 with per-ticket sum split
    "q73",  # ticket-count band join back to customer
    "q79",  # per-ticket profit/coupon rollup
    "q88",  # 8 half-hour count cells cross-joined
    # Round 5 batch 2: window / ratio / rollup shapes. Exactness note:
    # every fixture "decimal" is cents-valued, so double sums are exact
    # in ANY order (integer numerators << 2^53) and the derived window
    # averages, ratios, and ranks agree bit-for-bit across engines.
    "q6",   # scalar-subquery month anchor + 1.2x avg-price filter
    "q8",   # preferred-customer zip intersect + 2-digit prefix join
    "q28",  # six bucketed avg/count cells over one fact table
    "q36",  # gross-margin ROLLUP + rank within lochierarchy
    "q47",  # year-window avg + lag/lead monthly deviation (v1)
    "q53",  # quarterly manufact sums vs avg window
    "q59",  # week-over-week store revenue ratios (self-join)
    "q63",  # like q53 by manager
    "q70",  # state/county ROLLUP + rank, top-states subquery
    "q89",  # category avg window deviation
    "q98",  # class-partition revenue ratio
]
TABLES = {
    "date_dim": 120,
    "item": 60,
    "time_dim": 60,
    "household_demographics": 60,
    "store": 60,
    "customer": 60,
    "customer_address": 60,
    "store_sales": 6000,
}

# Correlated (category, class, brand) triples: q53/q63's two OR-groups,
# q89's two groups, and q98/q36's category lists all need REAL hierarchy
# values that co-occur on the same item row.
_ITEM_TRIPLES = [
    ("Books", "personal", "scholaramalgamalg #14"),
    ("Children", "portable", "scholaramalgamalg #7"),
    ("Electronics", "reference", "exportiunivamalg #9"),
    ("Electronics", "stereo", "importounivamalg #9"),
    ("Books", "computers", "scholaramalgamalg #9"),
    ("Sports", "football", "edu packscholar #2"),
    ("Women", "accessories", "amalgimporto #1"),
    ("Music", "classical", "edu packscholar #1"),
    ("Men", "pants", "exportiimporto #1"),
    ("Men", "shirts", "importoamalg #1"),
    ("Jewelry", "birdal", "amalgamalg #5"),
    ("Women", "dresses", "amalg #3"),
    ("Home", "bathroom", "glassy #4"),
    ("Sports", "archery", "brandbrand #6"),
    ("Books", "self-help", "scholaramalgamalg #8"),
]

# Named generators: i is the 0-based row index. Everything not listed
# falls to the generic rules (PK = i+1, FK cycles, arithmetic values).
SPECIAL = {
    "d_year": lambda i: 1998 + (i // 12) % 5,
    "d_moy": lambda i: 1 + i % 12,
    "d_dom": lambda i: 1 + i % 28,
    # Functions of (d_year, d_moy), so scalar subqueries anchored on a
    # (year, month) pair resolve to exactly one d_month_seq / d_qoy, the
    # calendar date is consistent with its year/month/day fields (q98's
    # d_date BETWEEN window), and week numbers repeat year-over-year 52
    # apart (q59's d_week_seq1 = d_week_seq2 - 52 join).
    "d_month_seq": lambda i: 1200 + ((i // 12) % 5) * 12 + i % 12,
    "d_qoy": lambda i: 1 + (i % 12) // 3,
    "d_date": lambda i: pd.Timestamp(
        1998 + (i // 12) % 5, 1 + i % 12, 1 + i % 28
    ),
    "d_week_seq": lambda i: ((i // 12) % 5) * 52 + (i % 12) * 4 + 1,
    "i_manufact_id": lambda i: 100 + i % 50,   # covers q3's 128
    "i_manager_id": lambda i: 1 + i % 30,      # covers 1 and 28 (x2 each)
    "i_brand_id": lambda i: 1 + i % 15,
    "i_brand": lambda i: _ITEM_TRIPLES[i % len(_ITEM_TRIPLES)][2],
    "i_category_id": lambda i: 1 + i % 8,
    "i_category": lambda i: _ITEM_TRIPLES[i % len(_ITEM_TRIPLES)][0],
    "i_class": lambda i: _ITEM_TRIPLES[i % len(_ITEM_TRIPLES)][1],
    "t_hour": lambda i: i % 24,                # covers q96's 20
    "t_minute": lambda i: i % 60,
    "hd_dep_count": lambda i: i % 10,          # covers q96's 7
    "s_store_name": lambda i: "ese" if i % 3 == 0 else f"store_{i}",
    "s_state": lambda i: "TN" if i % 2 == 0 else ["SD", "AL", "GA"][i % 3],
    # q8: customer zips concentrate on two values from the query's
    # 400-zip list so ">10 preferred customers per zip" is satisfiable,
    # and store zips share the same 2-digit prefixes; q19 still holds
    # because its cross-zip predicate needs the FULL 5-digit prefixes to
    # differ (24128/76232 vs 24xxx/76xxx variants).
    "ca_zip": lambda i: "24128" if i % 2 == 0 else "76232",
    "s_zip": lambda i: ("24" if i % 2 == 0 else "76") + str(100 + (i * 13) % 900),
    "c_preferred_cust_flag": lambda i: "Y" if i % 2 == 0 else "N",
    # q34/q73: buy-potential disjunction + county list.
    "hd_buy_potential": lambda i: [">10000", "unknown", "1001-5000",
                                   "501-1000"][i % 4],
    "s_county": lambda i: "Williamson County" if i % 2 == 0 else f"county_{i % 7}",
    # q88: vehicle counts must land in the <= dep+2 cells.
    "hd_vehicle_count": lambda i: i % 8,
    # q46/q68: city list membership (both sides of IN must exist).
    "s_city": lambda i: ["Fairview", "Midway", "Concord", "Spring Hill"][i % 4],
    # q79: employee-band filter.
    "s_number_employees": lambda i: 150 + (i * 3) % 200,
    # q43: day-of-week pivot + gmt-offset filter.
    "s_gmt_offset": lambda i: -5.0 if i % 2 == 0 else -6.0,
    "d_day_name": lambda i: ["Sunday", "Monday", "Tuesday", "Wednesday",
                             "Thursday", "Friday", "Saturday"][i % 7],
    # q34/q73 group per (ticket, customer) and band the COUNT: ticket
    # blocks of 1500 rows with one customer per block make the filtered
    # per-group counts land in q34's 15-20 band (1 group, simulated
    # against the exact mix: counts 12/13/14/17) and q73's 1-5 band
    # (3 groups). Interleaved or mixed assignments leave every group far
    # below 15, which empties q34.
    "ss_ticket_number": lambda i: 1 + i // 1500,
    "ss_customer_sk": lambda i: 1 + (i // 1500) % 60,
}

_PK = {
    "date_dim": "d_date_sk",
    "item": "i_item_sk",
    "time_dim": "t_time_sk",
    "household_demographics": "hd_demo_sk",
    "store": "s_store_sk",
    "customer": "c_customer_sk",
    "customer_address": "ca_address_sk",
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
        # QUARTER-valued amounts (k/4): exactly representable doubles, so
        # sums are exact dyadic rationals in ANY accumulation order and
        # every derived window avg / deviation ratio agrees bit-for-bit
        # across engines. (Cents values like 137.41 are inexact binary;
        # >100-row aggregates showed last-ulp spark-vs-duckdb drift.)
        return ((i * 137 + len(col) * 997) % 19997) / 4.0
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
                # date32 parquet, NOT datetime64[ns]: nanos timestamps read
                # back as BIGINT under the nanosAsLong conf and break
                # DATE comparisons (q98's d_date BETWEEN range).
                pdf[col] = pd.to_datetime(pdf[col]).dt.date
        path = str(root / f"{table}.parquet")
        pdf.to_parquet(path)
        paths[table] = path
        spark.read.parquet(path).createOrReplaceTempView(table)
    yield paths
    for table in TABLES:
        spark.catalog.dropTempView(table)


def _positional(pdf: pd.DataFrame) -> pd.DataFrame:
    # Engines name unaliased aggregates differently (count_star() vs
    # count(1)); results are compared by POSITION. Integer columns are
    # widened to float64 on both sides because DuckDB surfaces
    # SUM(INT) as HUGEINT -> float64 while Spark keeps BIGINT; every
    # value in these fixtures is far below 2**53, so the comparison
    # stays exact.
    out = pdf.copy()
    out.columns = [f"c{j}" for j in range(len(pdf.columns))]
    for c in out.columns:
        if out[c].dtype.kind in ("i", "u"):
            out[c] = out[c].astype("float64")
    return out


def _run_both(spark, paths: dict, sql: str, label: str) -> None:
    spark_pdf = spark.sql(sql).toPandas()
    con = duckdb.connect()
    try:
        for table, path in paths.items():
            con.execute(
                f'CREATE VIEW "{table}" AS '
                f"SELECT * FROM read_parquet('{path}')"
            )
        duck_pdf = con.execute(sql).fetchdf()
    finally:
        con.close()
    assert len(spark_pdf) > 0, f"{label}: empty result -- fixture too sparse"
    problems = compare_frames(_positional(spark_pdf), _positional(duck_pdf))
    assert not problems, f"{label}: " + "; ".join(problems)


@pytest.mark.parametrize("name", QUERIES)
def test_tpcds_query_executes_exactly(spark, tpcds_data, name):
    with open(os.path.join(RES, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    _run_both(spark, tpcds_data, sql, name)


# --------------------------------------------------------------- SSB
SSB_SUITE = (
    "/root/reference/sql/core/src/test/scala/org/apache/spark/sql/"
    "SSBQuerySuite.scala"
)
SSB_RES = "/root/reference/sql/core/src/test/resources/ssb"
# Round 5: ALL 13 SSB queries execute (integer measures -> exact sums).
SSB_QUERIES = ["1.1", "1.2", "1.3", "2.1", "2.2", "2.3",
               "3.1", "3.2", "3.3", "3.4", "4.1", "4.2", "4.3"]
SSB_TABLES = {
    "date": 120,
    "part": 60,
    "supplier": 30,
    "customer": 30,
    "lineorder": 6000,
}
SSB_PK = {
    "date": "d_datekey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "customer": "c_custkey",
}
SSB_FK_TARGET = {
    "lo_orderdate": ("date", 120),
    "lo_commitdate": ("date", 120),
    "lo_partkey": ("part", 60),
    "lo_suppkey": ("supplier", 30),
    "lo_custkey": ("customer", 30),
}
_SSB_REGIONS = ["AMERICA", "ASIA", "EUROPE", "AFRICA", "MIDDLE EAST"]
# UNITED KINGDOM holds two slots: 3.3/3.4 intersect UK customers with UK
# suppliers AND (3.4) a two-row Dec1997 date slice, so the UK population
# must be dense enough for the FK mix to land joint matches.
_SSB_NATIONS = ["UNITED KINGDOM", "UNITED STATES", "CHINA", "FRANCE",
                "RUSSIA", "UNITED KINGDOM", "JAPAN", "BRAZIL", "CANADA",
                "GERMANY"]


def _ssb_city(nation: str, i: int) -> str:
    # Cities are nation-consistent (SSB's c_city is derived from
    # c_nation); UK entities alternate the two cities 3.3/3.4 filter on.
    if nation == "UNITED KINGDOM":
        return "UNITED KI1" if i % 4 < 2 else "UNITED KI5"
    return f"{nation[:7]} C{i % 3}"
_SSB_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
               "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
SSB_SPECIAL = {
    # date: 120 rows = two 5-year calendars of months; derived fields
    # kept mutually consistent so conjunctive filters are satisfiable.
    "d_year": lambda i: 1993 + (i // 12) % 5,
    "d_yearmonthnum": lambda i: (1993 + (i // 12) % 5) * 100 + 1 + i % 12,
    "d_weeknuminyear": lambda i: 1 + (i // 3) % 52,  # week 6 lands in 1994
    "d_month": lambda i: f"month_{1 + i % 12}",
    # part/supplier/customer attribute vocabularies covering the
    # queries' constants (MFGR#12, MFGR#2221-2239 brands, AMERICA,
    # UNITED STATES, UNITED KI1/KI5 cities, Dec1997).
    "p_category": lambda i: f"MFGR#{10 + i % 5}",
    "p_brand1": lambda i: f"MFGR#{2200 + i % 40}",
    "p_mfgr": lambda i: f"MFGR#{1 + i % 5}",
    "s_region": lambda i: _SSB_REGIONS[i % 5],
    "c_region": lambda i: _SSB_REGIONS[(i + 2) % 5],
    "s_nation": lambda i: _SSB_NATIONS[i % 10],
    "c_nation": lambda i: _SSB_NATIONS[(i + 3) % 10],
    "s_city": lambda i: _ssb_city(_SSB_NATIONS[i % 10], i),
    "c_city": lambda i: _ssb_city(_SSB_NATIONS[(i + 3) % 10], i),
    "d_yearmonth": lambda i: _SSB_MONTHS[i % 12] + str(1993 + (i // 12) % 5),
    # lineorder measures sized to the SSB filter ranges.
    "lo_discount": lambda i: i % 11,
    "lo_quantity": lambda i: 1 + i % 50,
}


def _ssb_ddl_columns() -> dict[str, list[tuple[str, str]]]:
    with open(SSB_SUITE, encoding="utf-8") as fh:
        src = fh.read()
    out: dict[str, list[tuple[str, str]]] = {}
    for block in re.findall(r'"""(.*?)"""', src, flags=re.DOTALL):
        text = " ".join(
            line.split("|", 1)[1] if "|" in line else line
            for line in block.splitlines()
        )
        m = re.match(r"\s*CREATE TABLE `(\w+)` \((.*)\)\s*USING parquet", text)
        if not m or m.group(1) not in SSB_TABLES:
            continue
        out[m.group(1)] = re.findall(
            r"`(\w+)`\s+([A-Z]+(?:\(\d+,\d+\))?)", m.group(2)
        )
    assert set(out) == set(SSB_TABLES)
    return out


def _ssb_cell(table: str, col: str, typ: str, i: int):
    if col in SSB_SPECIAL:
        return SSB_SPECIAL[col](i)
    if col == SSB_PK.get(table):
        return i + 1
    if col in SSB_FK_TARGET:
        return 1 + _mix(i, col) % SSB_FK_TARGET[col][1]
    t = typ.upper()
    if t in ("INT", "BIGINT", "SMALLINT"):
        return (i * 7 + len(col)) % 1000
    if t == "STRING":
        return f"{col}_{i % 20}"
    raise AssertionError(f"unhandled type {typ} for {table}.{col}")


@pytest.fixture(scope="module")
def ssb_data(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ssb_exec")
    cols_by_table = _ssb_ddl_columns()
    paths = {}
    for table, n in SSB_TABLES.items():
        cols = cols_by_table[table]
        pdf = pd.DataFrame(
            {
                col: [_ssb_cell(table, col, typ, i) for i in range(n)]
                for col, typ in cols
            }
        )
        path = str(root / f"{table}.parquet")
        pdf.to_parquet(path)
        paths[table] = path
        spark.read.parquet(path).createOrReplaceTempView(table)
    yield paths
    for table in SSB_TABLES:
        spark.catalog.dropTempView(table)


@pytest.mark.parametrize("name", SSB_QUERIES)
def test_ssb_query_executes_exactly(spark, ssb_data, name):
    """Star Schema Benchmark execution sample: the flat filter-sum
    queries (1.x) and the two-dim rollup (2.1) run end-to-end on both
    engines over the same parquet (reference surface:
    SSBQuerySuite.scala -- compile-only there; executed here)."""
    with open(os.path.join(SSB_RES, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    _run_both(spark, ssb_data, sql, f"ssb-{name}")
