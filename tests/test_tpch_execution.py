"""Execute the reference's 22 TPC-H query texts value-exact vs DuckDB.

The reference ships the full TPC-H text set
(sql/core/src/test/resources/tpch/, compiled only by
TPCHQuerySuite.scala) -- this module EXECUTES all 22 on a deterministic
synthetic 8-table fixture and compares against DuckDB running the same
text over the same parquet.

Exactness design (the decisive choice): every money-like column is a
DOUBLE holding a DYADIC rational -- prices/balances/costs in quarter
steps (k/4), l_discount and l_tax in sixty-fourth steps (k/64).  Sums
and products of dyadic rationals below 2**53 are exact in IEEE double
in ANY accumulation order, so sum(), avg() (exact sum / count), and
the ratio queries (q8's market share, q14's promo percentage) produce
the SAME correctly-rounded double on both engines.  This sidesteps the
Spark-DECIMAL-vs-DuckDB-DOUBLE division-rounding class that keeps
TPC-DS q18 off the exact list.  (The reference's own DDL narrows every
TPC-H decimal to DECIMAL(10,0) -- integer money -- which would make the
discount-band queries q6/q19 vacuously empty; the spec types are
DECIMAL(15,2), and dyadic DOUBLE values inside those ranges express the
same queries meaningfully AND exactly.)

The sixty-fourth-step discounts land inside every band in the texts:
3/64 = 0.046875 in q6's [0.05-0.01, 0.05+0.01], and 1/16 through
6/64 across q19's implicit bands.

Structural needles:
 - lineitem rows 0..39 form five 8-line orders of quantity 50 (sum 400)
   so q18's HAVING sum(l_quantity) > 300 has groups;
 - l_returnflag/l_linestatus are BLOCK-constant (2000/1000/1000/2000
   rows) and every l_shipdate <= 1998-09-02, so q1's per-group counts
   are the block sizes -- 2**a * 5**b numbers dividing 10**4, keeping
   even a DECIMAL-typed avg exact (belt and braces on top of DOUBLE);
 - orders only reference customers 1..120, so q22's NOT EXISTS keeps
   customers 121..150 and q13's zero-order class is populated;
 - part types/brands/containers/sizes cycle with coprime periods so the
   spec conjunctions co-occur: part 56 is ECONOMY ANODIZED STEEL (q8),
   part 162 is Brand#23 + MED BOX + size 4 (q17, q19's second arm),
   parts 31/91/151 are size-15 %BRASS (q2, with a EUROPE supplier via
   partsupp rows 630..633 -> supplier 32 = FRANCE);
 - lineitem (l_partkey, l_suppkey) pairs are drawn FROM the partsupp
   pair set (supp = 1 + ((part-1)*7 + pick) % 50, pick in 0..3), so
   q9's double join finds every line's cost row.
"""
from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
import pytest

from tests.oracle_harness import bind_views, compare_frames
from tests.test_tpcds_execution import _mix, _positional

RES_TPCH = "/root/reference/sql/core/src/test/resources/tpch"
REF_SUITE = (
    "/root/reference/sql/core/src/test/scala/org/apache/spark/sql/"
    "TPCHQuerySuite.scala"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES_TPCH), reason="reference resources not available"
)

TPCH_QUERIES = [f"q{n}" for n in range(1, 23)]

_BASE = datetime.date(1992, 1, 1)
_SHIP_CAP = datetime.date(1998, 9, 2)    # q1's cutoff: every row passes


def _day(i: int) -> datetime.date:
    return _BASE + datetime.timedelta(days=i)


_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# (name, regionkey) -- the spec's 25 nations.
_NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
_COLORS = ["green", "forest", "lime", "navy", "peru", "ivory", "khaki",
           "salmon", "plum", "smoke", "wheat"]
_PT_A = ["STANDARD", "ECONOMY", "MEDIUM", "LARGE", "SMALL", "PROMO"]
_PT_B = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
_PT_C = ["TIN", "NICKEL", "BRASS", "STEEL"]
_SIZES = [15, 49, 14, 23, 45, 19, 3, 36, 9, 1, 2, 4, 5, 7, 10]
_CONTAINERS = ["SM CASE", "SM BOX", "SM PACK", "SM PKG",
               "MED BAG", "MED BOX", "MED PKG", "MED PACK",
               "LG CASE", "LG BOX", "LG PACK", "LG PKG"]
_SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
             "FURNITURE"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
               "5-LOW"]
_SHIPMODES = ["MAIL", "SHIP", "AIR", "AIR REG", "RAIL", "TRUCK", "FOB",
              "REG AIR"]
_INSTRUCTS = ["DELIVER IN PERSON", "COLLECT COD", "NONE",
              "TAKE BACK RETURN"]
# q22's country-code list is ('13','31','23','29','30','18','17');
# three codes outside it keep the filter selective.
_PHONE_CC = [13, 31, 23, 29, 30, 18, 17, 25, 27, 11]
# Dyadic sixty-fourths: 0, 3/64 (in q6's band), 1/16, 5/64, 3/32, 1/8.
_DISCOUNTS = [0.0, 0.046875, 0.0625, 0.078125, 0.09375, 0.125]
_TAXES = [0.0, 0.015625, 0.03125, 0.046875, 0.0625]


def _quarter(i: int, salt: int, span: int) -> float:
    return ((i * 137 + salt) % span) / 4.0


def _lineitem_order(i: int) -> tuple[int, int]:
    if i < 40:
        return 1 + i // 8, 1 + i % 8          # five 8-line orders (q18)
    return 6 + (i - 40) // 4, 1 + (i - 40) % 4


def _lineitem_part_supp(i: int) -> tuple[int, int]:
    part = 1 + _mix(i, "l_partkey") % 200
    pick = _mix(i, "l_suppkey") % 4
    return part, 1 + ((part - 1) * 7 + pick) % 50


def _flag_status(i: int) -> tuple[str, str]:
    if i < 2000:
        return "N", "O"
    if i < 3000:
        return "A", "F"
    if i < 4000:
        return "R", "F"
    return "N", "F"


def _order_date(i: int) -> datetime.date:
    return _day(_mix(i, "o_orderdate") % 2405)    # 1992-01-01..1998-08-02


def _build_tables() -> dict[str, pd.DataFrame]:
    region = pd.DataFrame({
        "r_regionkey": range(5),
        "r_name": _REGIONS,
        "r_comment": [f"region comment {i}" for i in range(5)],
    })
    nation = pd.DataFrame({
        "n_nationkey": range(25),
        "n_name": [n for n, _ in _NATIONS],
        "n_regionkey": [r for _, r in _NATIONS],
        "n_comment": [f"nation comment {i}" for i in range(25)],
    })
    supplier = pd.DataFrame({
        "s_suppkey": [i + 1 for i in range(50)],
        "s_name": [f"Supplier#{i + 1:09d}" for i in range(50)],
        "s_address": [f"addr supplier {i}" for i in range(50)],
        "s_nationkey": [i % 25 for i in range(50)],
        "s_phone": [f"{10 + i % 25}-555-{1000 + i}" for i in range(50)],
        "s_acctbal": [_quarter(i, 997, 36000) - 500.0 for i in range(50)],
        # q16 excludes '%Customer%Complaints%' suppliers.
        "s_comment": ["Customer Complaints filed" if i in (19, 37)
                      else f"supplier comment {i}" for i in range(50)],
    })
    part = pd.DataFrame({
        "p_partkey": [i + 1 for i in range(200)],
        "p_name": [f"{_COLORS[i % 11]} {_COLORS[(i * 7 + 3) % 11]}"
                   for i in range(200)],
        "p_mfgr": [f"Manufacturer#{1 + i % 5}" for i in range(200)],
        "p_brand": [f"Brand#{1 + i % 5}{1 + (i // 5) % 5}"
                    for i in range(200)],
        "p_type": [f"{_PT_A[i % 6]} {_PT_B[i % 5]} {_PT_C[i % 4]}"
                   for i in range(200)],
        "p_size": [_SIZES[i % 15] for i in range(200)],
        "p_container": [_CONTAINERS[i % 12] for i in range(200)],
        "p_retailprice": [900.0 + _quarter(i, 11, 4000) for i in range(200)],
        "p_comment": [f"part comment {i}" for i in range(200)],
    })
    partsupp = pd.DataFrame({
        "ps_partkey": [1 + i % 200 for i in range(800)],
        "ps_suppkey": [1 + ((i % 200) * 7 + i // 200) % 50
                       for i in range(800)],
        "ps_availqty": [1 + (i * 13) % 9999 for i in range(800)],
        "ps_supplycost": [_quarter(i, 119, 16000) for i in range(800)],
        "ps_comment": [f"partsupp comment {i}" for i in range(800)],
    })
    customer = pd.DataFrame({
        "c_custkey": [i + 1 for i in range(150)],
        "c_name": [f"Customer#{i + 1:09d}" for i in range(150)],
        "c_address": [f"addr customer {i}" for i in range(150)],
        "c_nationkey": [i % 25 for i in range(150)],
        "c_phone": [f"{_PHONE_CC[i % 10]}-555-{2000 + i}"
                    for i in range(150)],
        "c_acctbal": [((i * 131 + 7) % 8000) / 4.0 - 500.0
                      for i in range(150)],
        "c_mktsegment": [_SEGMENTS[i % 5] for i in range(150)],
        "c_comment": [f"customer comment {i}" for i in range(150)],
    })
    odates = [_order_date(i) for i in range(1500)]
    orders = pd.DataFrame({
        "o_orderkey": [i + 1 for i in range(1500)],
        # Customers 121..150 stay orderless (q13's zero class, q22's
        # NOT EXISTS population).
        "o_custkey": [1 + _mix(i, "o_custkey") % 120 for i in range(1500)],
        "o_orderstatus": ["F" if odates[i] < datetime.date(1995, 6, 1)
                          else "O" if odates[i] > datetime.date(1996, 6, 1)
                          else "P" for i in range(1500)],
        "o_totalprice": [_quarter(i, 41, 800000) for i in range(1500)],
        "o_orderdate": odates,
        "o_orderpriority": [_PRIORITIES[i % 5] for i in range(1500)],
        "o_clerk": [f"Clerk#{i % 100:09d}" for i in range(1500)],
        "o_shippriority": [0] * 1500,
        "o_comment": ["special requests handled" if i % 7 == 0
                      else f"order comment {i}" for i in range(1500)],
    })
    li_rows = []
    for i in range(6000):
        okey, lno = _lineitem_order(i)
        pkey, skey = _lineitem_part_supp(i)
        odate = odates[okey - 1]
        ship = min(odate + datetime.timedelta(
            days=1 + _mix(i, "l_shipdate") % 120), _SHIP_CAP)
        commit = ship + datetime.timedelta(days=_mix(i, "l_commitdate")
                                           % 60 - 30)
        receipt = ship + datetime.timedelta(days=1 + _mix(i, "l_receiptdate")
                                            % 30)
        if 44 <= i < 48:
            # q21 needle: order 7 ('F', 1994-03-23).  Line 44 comes from
            # SAUDI ARABIA's supplier 21 (part 11's partsupp set) and is
            # the order's ONLY late line; lines 45..47 come from
            # supplier 1 (part 1) and arrive before their commit dates,
            # so the exists/not-exists pair keeps exactly supplier 21.
            pkey, skey = (11, 21) if i == 44 else (1, 1)
            commit = ship + datetime.timedelta(
                days=-10 if i == 44 else 60)
            receipt = ship + datetime.timedelta(days=5)
        flag, status = _flag_status(i)
        li_rows.append({
            "l_orderkey": okey,
            "l_partkey": pkey,
            "l_suppkey": skey,
            "l_linenumber": lno,
            "l_quantity": float(50 if i < 40
                                else 1 + _mix(i, "l_quantity") % 50),
            "l_extendedprice": ((i * 137 + 11) % 360000) / 4.0,
            "l_discount": _DISCOUNTS[_mix(i, "l_discount") % 6],
            "l_tax": _TAXES[_mix(i, "l_tax") % 5],
            "l_returnflag": flag,
            "l_linestatus": status,
            "l_shipdate": ship,
            "l_commitdate": commit,
            "l_receiptdate": receipt,
            "l_shipinstruct": _INSTRUCTS[i % 4],
            "l_shipmode": _SHIPMODES[i % 8],
            "l_comment": f"line comment {i}",
        })
    lineitem = pd.DataFrame(li_rows)
    return {
        "region": region, "nation": nation, "supplier": supplier,
        "part": part, "partsupp": partsupp, "customer": customer,
        "orders": orders, "lineitem": lineitem,
    }


@pytest.fixture(scope="module")
def tpch_data(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tpch_exec")
    paths = {}
    for table, pdf in _build_tables().items():
        # datetime.date cells land as parquet date32 via pyarrow's
        # object-column date inference; both engines read them as DATE.
        path = str(root / f"{table}.parquet")
        pdf.to_parquet(path)
        paths[table] = path
        spark.read.parquet(path).createOrReplaceTempView(table)
    yield paths
    for table in paths:
        spark.catalog.dropTempView(table)


def _run_both_tpch(spark, paths: dict, sql: str, label: str) -> None:
    bind_views(spark, paths)  # overlapping-name safety: see oracle_harness
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


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_tpch_query_executes_exactly(spark, tpch_data, name):
    with open(os.path.join(RES_TPCH, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    _run_both_tpch(spark, tpch_data, sql, f"tpch/{name}")
