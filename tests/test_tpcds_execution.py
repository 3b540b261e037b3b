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

from tests.oracle_harness import bind_views, compare_frames

REF_SUITE = (
    "/root/reference/sql/core/src/test/scala/org/apache/spark/sql/"
    "TPCDSQuerySuite.scala"
)
RES = "/root/reference/sql/core/src/test/resources/tpcds"

# xdist_group: see test_tpcds_modified_execution.py -- both modules bind
# the bare TPC-DS table names as session-global temp views; keep them on
# one worker under pytest-xdist --dist loadgroup.
pytestmark = [
    pytest.mark.slow,  # r13: execution-twin lane (VERDICT r12 item 2)
    pytest.mark.skipif(
        not os.path.isdir(RES), reason="reference resources not available"
    ),
    pytest.mark.xdist_group("tpcds_bare_views"),
]

QUERIES = [
    # 83 of the 103 public TPC-DS queries execute end-to-end value-exact
    # vs DuckDB on the deterministic 24-table fixture here (the
    # reference's TPCDSQuerySuite is compile-only for all of them), and
    # 16 more (q2, q14b, q17, q23b, q24a/b, q39a/b, q41, q54, q58, q64,
    # q72, q77, q83, q85) execute on test_tpcds_modified_execution's
    # real-Julian-calendar fixture, whose structure (plus three
    # documented disambiguation transforms for DuckDB's stricter
    # parser/binder) dissolves their blockers -- see
    # V14_CALENDAR_QUERIES there.  Plus q18 on the dyadic power-of-two
    # fixture of test_tpcds_decimal_execution (its DECIMAL-avg
    # divergence class dissolves when every group mean is exactly
    # representable on both engines).  103 of 103 total as of r07:
    #  - q67 and q14a (rank/NULL-order ties at a BINDING LIMIT 100
    #    boundary pick engine-dependent row sets) execute value-exact on
    #    test_tpcds_rank_boundary_execution's dedicated sub-LIMIT
    #    fixture -- the divergence is a property of the binding
    #    boundary, not of the computation, and below it both engines
    #    must and do agree;
    #  - q32 (the public text's malformed date literal '2000-01-27]',
    #    which NO modern engine runs as shipped -- also noted in
    #    tests/test_benchmark_suites.py) executes value-exact with the
    #    documented one-character deletion in test_tpcds_q32_execution,
    #    which also pins the as-published behavior of all three engine
    #    vintages (ANSI throw / 2.4 NULL-fold to zero rows / DuckDB
    #    timestamp-coercion error).
    "q1",
    "q3",
    "q4",
    "q5",
    "q6",
    "q7",
    "q8",
    "q9",
    "q10",
    "q11",
    "q12",
    "q13",
    "q15",
    "q16",
    "q19",
    "q20",
    "q21",
    "q22",
    "q23a",
    "q25",
    "q26",
    "q27",
    "q28",
    "q29",
    "q30",
    "q31",
    "q33",
    "q34",
    "q35",
    "q36",
    "q37",
    "q38",
    "q40",
    "q42",
    "q43",
    "q44",
    "q45",
    "q46",
    "q47",
    "q48",
    "q49",
    "q50",
    "q51",
    "q52",
    "q53",
    "q55",
    "q56",
    "q57",
    "q59",
    "q60",
    "q61",
    "q62",
    "q63",
    "q65",
    "q66",
    "q68",
    "q69",
    "q70",
    "q71",
    "q73",
    "q74",
    "q75",
    "q76",
    "q78",
    "q79",
    "q80",
    "q81",
    "q82",
    "q84",
    "q86",
    "q87",
    "q88",
    "q89",
    "q90",
    "q91",
    "q92",
    "q93",
    "q94",
    "q95",
    "q96",
    "q97",
    "q98",
    "q99",
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
    # Round-5 batch 3: the full 24-table schema, unlocking the
    # multi-channel (catalog/web/returns/inventory) query families.
    "customer_demographics": 60,
    "promotion": 30,
    "warehouse": 15,
    "ship_mode": 15,
    "reason": 15,
    "income_band": 20,
    "call_center": 15,
    "catalog_page": 30,
    "web_site": 15,
    "web_page": 30,
    "store_returns": 1500,
    "catalog_sales": 6000,
    "catalog_returns": 1500,
    "web_sales": 6000,
    "web_returns": 1500,
    "inventory": 3000,
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

_CD_PAIRS = [
    ("M", "Unknown"), ("W", "Advanced Degree"), ("S", "College"),
    ("M", "4 yr Degree"), ("S", "Secondary"), ("W", "2 yr Degree"),
    ("M", "Advanced Degree"), ("D", "Primary"), ("U", "Unknown"),
    ("S", "4 yr Degree"), ("W", "Secondary"),
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
    "d_month_seq": lambda i: 1176 + ((i // 12) % 5) * 12 + i % 12,
    "d_qoy": lambda i: 1 + (i % 12) // 3,
    "d_date": lambda i: pd.Timestamp(
        1998 + (i // 12) % 5, 1 + i % 12, 1 + i % 28
    ),
    "d_week_seq": lambda i: [0, 53, 105, 157, 209][(i // 12) % 5]
    + (i % 12) * 4 + 1,
    # Covers q3's 128, q37's 677/940/694/808, q82's 129/270/821/423.
    "i_manufact_id": lambda i: [128, 677, 940, 694, 808, 129, 270, 821,
                                423, 136, 140, 145][i % 12],
    # Price bands: q21's [0.99, 1.49], q37's [68, 98], q82's [62, 92];
    # quarter-valued so derived averages stay exact.
    "i_current_price": lambda i: [1.00, 1.25, 69.5, 75.0, 88.25, 63.75,
                                  5.0, 33.25, 12.5, 99.75, 2.5, 45.0][i % 12],
    "i_color": lambda i: ["slate", "blanched", "burnished", "powder", "khaki",
                          "orchid", "peach", "metallic", "navajo", "salmon"][i % 10],
    "i_manager_id": lambda i: 1 + i % 30,      # covers 1 and 28 (x2 each)
    "i_brand_id": lambda i: 1 + i % 15,
    "i_brand": lambda i: _ITEM_TRIPLES[i % len(_ITEM_TRIPLES)][2],
    "i_category_id": lambda i: 1 + i % 8,
    "i_category": lambda i: _ITEM_TRIPLES[i % len(_ITEM_TRIPLES)][0],
    "i_class": lambda i: _ITEM_TRIPLES[i % len(_ITEM_TRIPLES)][1],
    "t_hour": lambda i: i % 24,                # covers q96's 20
    "t_minute": lambda i: i % 60,
    "t_meal_time": lambda i: ["breakfast", "dinner", "lunch", ""][i % 4],
    "t_time": lambda i: i * 1000,
    "sm_carrier": lambda i: ["DHL", "BARIAN", "UPS", "FEDEX"][i % 4],
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
    # Address geography (q10 counties; q18/q85 state lists; q33/q56/q60
    # need ca_gmt_offset = -5, q91 needs -7).
    "ca_county": lambda i: ["Rush County", "Toole County", "Jefferson County",
                            "Dona Ana County", "La Porte County",
                            "Walker County"][i % 6],
    "ca_city": lambda i: ["Edgewood", "Fairview", "Midway", "Pleasant Hill",
                          "Centerville"][i % 5],
    "ca_country": lambda i: "United States",
    "ca_state": lambda i: ["IN", "MS", "OH", "NJ", "LA", "IA", "AR", "WI",
                           "CT", "KY", "ND", "OK", "NM", "VA", "GA", "IL"][i % 16],
    "ca_gmt_offset": lambda i: float([-5, -6, -7][i % 3]),
    # q93/q85: reason descriptions ('reason 28' + substr grouping).
    "r_reason_desc": lambda i: f"reason {28 + i}",
    # q34/q73 compare = '>10000' / 'unknown' (lowercase); q91 LIKE
    # 'Unknown%' / '0-500%' -- the cycle carries all four spellings.
    "hd_buy_potential": lambda i: [">10000", "unknown", "Unknown",
                                   "0-500"][i % 4],
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
    # Demographics vocabularies (q7/q13/q18/q26/q27 filter constants).
    "cd_gender": lambda i: "MF"[i % 2],
    # (marital, education) as CORRELATED pairs -- the q13/q85/q91-style
    # filters AND a marital status with an education level, and
    # independent cycles make each conjunction a ~1-row needle. Odd
    # length keeps the pair cycle coprime with the gender cycle.
    "cd_marital_status": lambda i: _CD_PAIRS[i % len(_CD_PAIRS)][0],
    "cd_education_status": lambda i: _CD_PAIRS[i % len(_CD_PAIRS)][1],
    "cd_dep_count": lambda i: i % 10,
    # Promotion channel flags (q7/q26's Y/N disjunctions, q61's
    # promotional-sales ratio must be non-null on both engines).
    "p_channel_dmail": lambda i: "YN"[i % 2],
    "p_channel_email": lambda i: "NY"[i % 2],
    "p_channel_tv": lambda i: "NY"[(i // 2) % 2],
    "p_channel_event": lambda i: "YN"[(i // 2) % 2],
    # Inventory quantities sized to the 100-500 band (q21/q37/q82), and
    # a fifth of snapshots pinned to the four dates flanking q21's
    # 2000-03-11 cutoff so (warehouse, item) pairs have stock on BOTH
    # sides of it; the rest stay spread for q22's month_seq windows.
    "inv_quantity_on_hand": lambda i: i % 1000,
    "inv_date_sk": lambda i: (
        [26, 87, 27, 88][i % 4] if i % 5 == 0
        else 1 + _mix(i, "inv_date_sk") % 120
    ),
    # q90: am/pm ratio needs web pages in the 5000-5200 char band.
    "wp_char_count": lambda i: 4900 + (i * 20) % 500,
    # q18: bill-customer birth months.
    "c_birth_month": lambda i: 1 + i % 12,
    # q34/q73 group per (ticket, customer) and band the COUNT: ticket
    # blocks of 1500 rows with one customer per block make the filtered
    # per-group counts land in q34's 15-20 band (1 group, simulated
    # against the exact mix: counts 12/13/14/17) and q73's 1-5 band
    # (3 groups). Interleaved or mixed assignments leave every group far
    # below 15, which empties q34.
    "ss_ticket_number": lambda i: 1 + i // 1500,
    "ss_customer_sk": lambda i: [2, 9, 46, 52][i // 1500],
    # Catalog/web order numbers: 20-line orders, so order-number joins
    # (q16/q94/q95 shipping checks, returns anti-joins) have realistic
    # multiplicity instead of 100-value collisions.
    "cs_order_number": lambda i: 1 + i // 20,
    "ws_order_number": lambda i: 1 + i // 20,
    # Channel populations are PROPER SUBSETS of the customer base:
    # web buyers are customers 1-30, catalog buyers 1-40. q69/q10-style
    # [NOT] EXISTS probes need customers who genuinely never bought in a
    # channel; uniform FKs over all 60 make NOT EXISTS vacuously false.
    # Store customers (below) are {2, 9, 46, 52}: 2 and 9 buy in all
    # channels (q10's EXISTS arm), 46 and 52 in none (q69's NOT EXISTS
    # arm) -- and all four live in q10's counties / q69's states
    # (verified against the _mix address draws).
    "ws_bill_customer_sk": lambda i: 1 + _mix(i, "ws_bill_customer_sk") % 30,
    "cs_bill_customer_sk": lambda i: 1 + _mix(i, "cs_bill_customer_sk") % 40,
    "cs_ship_customer_sk": lambda i: 1 + _mix(i, "cs_ship_customer_sk") % 40,
    # q84: income bands intersecting [38128, 50000].
    "ib_lower_bound": lambda i: 30000 + i * 1000,
    "ib_upper_bound": lambda i: 40000 + i * 1000,
    # CORRELATED RETURNS: return row i mirrors sales row j = 4i mod N,
    # so (item, ticket/order, customer) triple joins between a sales
    # fact and its returns fact (q17/q25/q29/q50 store; q16 catalog;
    # q85/q94/q95 web) actually find matching lines -- independent
    # random FKs make a 3-column equality join structurally empty.
    # q44's benchmark anchor averages profits of rows with a NULL
    # address FK; one row in 20 gets one (pandas nullable Int64 ->
    # int64 parquet with nulls on both engines).
    "ss_addr_sk": lambda i: None if i % 20 == 0 else 1 + _mix(i, "ss_addr_sk") % 60,
    # Customer 9 (an all-channel buyer) lives at a Dona Ana County
    # address (sk 10 -- address row r = 9: r % 6 == 3 puts it in
    # "Dona Ana County", which sits in BOTH q10's and q10a's county
    # lists, and r % 3 == 0 keeps ca_gmt_offset = -5 for q61's
    # promotional-ratio population). Customer 2 MUST keep its mix draw:
    # it is the only customer whose (gmt_offset -7, cd pair, Unknown
    # buy-potential) conjunction feeds q91.
    "c_current_addr_sk": lambda i: {8: 10}.get(
        i, 1 + _mix(i, "c_current_addr_sk") % 60),
    # q76 counts fact rows with NULL dimension FKs per channel.
    "ss_store_sk": lambda i: None if i % 25 == 0 else 1 + _mix(i, "ss_store_sk") % 60,
    "ws_ship_customer_sk": lambda i: (
        None if i % 25 == 0 else 1 + _mix(i, "ws_ship_customer_sk") % 60),
    "cs_ship_addr_sk": lambda i: (
        None if i % 25 == 0 else 1 + _mix(i, "cs_ship_addr_sk") % 60),
    "sr_return_amt": lambda i: ((i * 137 + 997) % 79997) / 4.0,
    "cr_return_amount": lambda i: ((i * 139 + 1997) % 79997) / 4.0,
    "wr_return_amt": lambda i: ((i * 149 + 2997) % 79997) / 4.0,
    "sr_item_sk": lambda i: 1 + _mix(1500 + (i * 2) % 3000, "ss_item_sk") % 60,
    "sr_customer_sk": lambda i: [2, 9, 46, 52][1 + ((i * 2) % 3000) // 1500],
    "sr_ticket_number": lambda i: 2 + ((i * 2) % 3000) // 1500,
    "cr_item_sk": lambda i: 1 + _mix((i * 4) % 6000, "cs_item_sk") % 60,
    "cr_order_number": lambda i: 1 + ((i * 4) % 6000) // 20,
    "cr_returning_customer_sk": lambda i: 1
    + _mix((i * 4) % 6000, "cs_bill_customer_sk") % 60,
    # ~25% of catalog returns land in Nov 1998 (date_sks 11 and 71):
    # q91's conjunction (call-center month x cd pair x buy-potential x
    # gmt offset) needs that density; the other 75% stay spread so the
    # q80-style 30-day windows elsewhere keep their rows.
    "cr_returned_date_sk": lambda i: (
        [11, 71][_mix(i, "cr_returned_date_sk") % 2]
        if _mix(i, "cr_returned_date_sk") % 4 == 0
        else 1 + _mix(i, "cr_returned_date_sk") % 120
    ),
    "wr_item_sk": lambda i: 1 + _mix((i * 4) % 6000, "ws_item_sk") % 60,
    "wr_order_number": lambda i: 1 + ((i * 4) % 6000) // 20,
    "wr_returning_customer_sk": lambda i: 1
    + _mix((i * 4) % 6000, "ws_bill_customer_sk") % 60,
}

_PK = {
    "date_dim": "d_date_sk",
    "item": "i_item_sk",
    "time_dim": "t_time_sk",
    "household_demographics": "hd_demo_sk",
    "store": "s_store_sk",
    "customer": "c_customer_sk",
    "customer_address": "ca_address_sk",
    "customer_demographics": "cd_demo_sk",
    "promotion": "p_promo_sk",
    "warehouse": "w_warehouse_sk",
    "ship_mode": "sm_ship_mode_sk",
    "reason": "r_reason_sk",
    "income_band": "ib_income_band_sk",
    "call_center": "cc_call_center_sk",
    "catalog_page": "cp_catalog_page_sk",
    "web_site": "web_site_sk",
    "web_page": "wp_web_page_sk",
}

# FK target sizes by column-name suffix (order matters: first match wins).
_FK_SIZES = [
    ("_date_sk", 120),
    ("_time_sk", 60),
    ("_item_sk", 60),
    ("_customer_sk", 60),
    ("_cdemo_sk", 60),
    ("_hdemo_sk", 60),
    ("_addr_sk", 60),
    ("_store_sk", 60),
    ("_promo_sk", 30),
    ("_warehouse_sk", 15),
    ("_ship_mode_sk", 15),
    ("_mode_sk", 15),
    ("_reason_sk", 15),
    ("_income_band_sk", 20),
    ("_call_center_sk", 15),
    ("_catalog_page_sk", 30),
    ("_page_sk", 30),
    ("_web_site_sk", 15),
    ("_site_sk", 15),
]


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
        size = next((n for suf, n in _FK_SIZES if col.endswith(suf)), 60)
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
            elif typ.upper() in ("INT", "BIGINT", "SMALLINT") and pdf[col].isna().any():
                # Keep nullable integer FKs int64-typed in parquet.
                pdf[col] = pdf[col].astype("Int64")
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
    # stays exact. DATE columns come back as datetime.date from Spark
    # but midnight datetime64 from DuckDB's fetchdf -- normalise both
    # to ISO date strings (q51 outputs d_date directly).
    out = pdf.copy()
    out.columns = [f"c{j}" for j in range(len(pdf.columns))]
    for c in out.columns:
        if out[c].dtype.kind in ("i", "u"):
            out[c] = out[c].astype("float64")
        elif out[c].dtype.kind == "M":
            out[c] = out[c].dt.strftime("%Y-%m-%d")
        elif out[c].dtype.kind == "O":
            import datetime
            from decimal import Decimal

            out[c] = out[c].map(
                lambda v: v.isoformat() if isinstance(v, datetime.date)
                else float(v) if isinstance(v, Decimal)  # q90's DECIMAL ratio
                else v
            )
    return out


def _run_both(spark, paths: dict, sql: str, label: str) -> None:
    bind_views(spark, paths)  # overlapping-name safety: see oracle_harness
    spark_pdf = spark.sql(sql).toPandas()
    con = duckdb.connect()
    try:
        for table, path in paths.items():
            con.execute(
                f'CREATE VIEW "{table}" AS '
                f"SELECT * FROM read_parquet('{path}')"
            )
        # Some public query texts quote identifiers Spark-style
        # (`returns`); DuckDB uses double quotes for the same thing.
        # q77/q77a additionally use the bare word `returns` as a column
        # alias, which DuckDB's parser reserves -- quoting the
        # standalone token (never part of store_returns etc., which
        # have no word boundary) is the same pure lexical transform.
        duck_sql = sql.replace("`", '"')
        duck_sql = re.sub(r'(?<!")\breturns\b(?!")', '"returns"', duck_sql)
        duck_pdf = con.execute(duck_sql).fetchdf()
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


def test_run_both_survives_foreign_view_rebinding(spark, tpcds_data):
    """Ordering-independence regression test for the cross-module
    temp-view hazard: another module's fixture (modified-TPC-DS,
    decimal-q18, SSB, TPC-H) rebinding a shared bare name between our
    fixture setup and a query execution must not change results --
    _run_both rebinds from its own path map at call time."""
    spark.createDataFrame(
        [(0,)], "d_date_sk int"
    ).createOrReplaceTempView("date_dim")
    spark.createDataFrame(
        [(0,)], "ss_item_sk int"
    ).createOrReplaceTempView("store_sales")
    name = QUERIES[0]
    with open(os.path.join(RES, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    _run_both(spark, tpcds_data, sql, f"{name}-after-foreign-rebind")


# ------------------------------------------------- TPC-DS v2.7 variants
RES_V27 = "/root/reference/sql/core/src/test/resources/tpcds-v2.7.0"

V27_QUERIES = [
    # 24 of the 32 v2.7 variant queries execute end-to-end value-exact on
    # the SAME 24-table fixture (the reference compiles them only —
    # TPCDSQuerySuite `tpcdsQueriesV2_7_0`; q77a via the `returns`-alias
    # quoting transform in _run_both), and 4 more (q14, q24, q64 — the
    # multi-channel funnels — plus q72 with its ORDER BY disambiguation)
    # on the calendar fixture
    # (test_tpcds_modified_execution.V27_CALENDAR_QUERIES), and q18a on
    # test_tpcds_decimal_execution's dyadic power-of-two fixture (the
    # DECIMAL-avg class, closed in r06). 32 of 32 total as of r07: the
    # last 3 -- q14a, q22a, q67a, the rank/NULL-order-tie class (Spark
    # sorts NULL-first, DuckDB NULL-last over the rollup grouping
    # columns, and rank ties straddle a BINDING LIMIT 100 cutoff, so
    # the engines legitimately pick different row sets; verified by
    # sorted-multiset compare still mismatching at row ~96) -- execute
    # value-exact on test_tpcds_rank_boundary_execution's dedicated
    # sub-LIMIT fixture, where the boundary never binds and agreement
    # is required.
    "q10a",
    "q11",
    "q12",
    "q20",
    "q22",
    "q27a",
    "q34",
    "q35",
    "q35a",
    "q36a",
    "q47",
    "q49",
    "q51a",
    "q57",
    "q5a",
    "q6",
    "q70a",
    "q74",
    "q75",
    "q77a",
    "q78",
    "q80a",
    "q86a",
    "q98",
]


@pytest.mark.parametrize("name", V27_QUERIES)
def test_tpcds_v27_query_executes_exactly(spark, tpcds_data, name):
    with open(os.path.join(RES_V27, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    _run_both(spark, tpcds_data, sql, f"v2.7/{name}")


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
