"""Execute the reference's tpcds-modifiedQueries value-exact vs DuckDB.

The reference ships 21 "modified" TPC-DS queries plus ss_max
(sql/core/src/test/resources/tpcds-modifiedQueries/, compiled only by
TPCDSQuerySuite `modifiedTPCDSQueries`).  Unlike the v1.4/v2.7 texts,
these carry REAL TPC-DS Julian-day partition-key filters
(ss_sold_date_sk between 2451545 and 2451910, IN-lists of day sks, ...),
so the shared 1..120-sk fixture of test_tpcds_execution can never
satisfy them.  This module builds a second, self-contained fixture
around an actual calendar: date_dim is five full years 1998-01-01 ..
2002-12-31 with d_date_sk = the true Julian day number (JDN 2450815 ==
1998-01-01, the TPC-DS convention), and every derived field (d_year,
d_moy, d_dom, d_day_name, d_week_seq, d_month_seq = (year-1900)*12 +
moy-1, d_qoy) computed from the same calendar date.  The partition-key
sk windows, the d_dom IN-list days, and q59's d_week_seq = d_week_seq-52
year-over-year pairing then all hold by construction.

DuckDB-side lexical transforms (semantics identical): backticks ->
double quotes, and modified q10's `left semi join` -> DuckDB's
`semi join` spelling.
"""
from __future__ import annotations

import datetime
import os
import re

import duckdb
import pandas as pd
import pytest

from tests.oracle_harness import bind_views, compare_frames
from tests.test_tpcds_execution import _ddl_columns, _mix, _positional

RES_MOD = "/root/reference/sql/core/src/test/resources/tpcds-modifiedQueries"

# xdist_group: this module and test_tpcds_execution both (re)bind the
# bare TPC-DS table names as session-global temp views in module-scoped
# fixtures -- safe sequentially, a collision if the two modules run
# concurrently in one Spark session. Pinning both to one xdist group
# keeps them on the same worker under pytest-xdist --dist loadgroup.
pytestmark = [
    pytest.mark.slow,  # r13: execution-twin lane (VERDICT r12 item 2)
    pytest.mark.skipif(
        not os.path.isdir(RES_MOD), reason="reference resources not available"
    ),
    pytest.mark.xdist_group("tpcds_bare_views"),
]

MOD_QUERIES = [
    "q3", "q7", "q10", "q19", "q27", "q34", "q42", "q43", "q46", "q52",
    "q53", "q55", "q59", "q63", "q65", "q68", "q73", "q79", "q89", "q98",
    "ss_max",
]

MOD_TABLES = {
    "date_dim": 1826,            # 1998-01-01 .. 2002-12-31, one row per day
    "store_sales": 8000,
    "web_sales": 1500,
    "catalog_sales": 1500,
    "item": 60,
    "store": 30,
    "customer": 60,
    "customer_address": 60,
    "customer_demographics": 60,
    "household_demographics": 60,
    "promotion": 30,
    # Returns channels + q85's dimensions: not referenced by any
    # modified query, but they let the v1.4 texts whose structural
    # blockers dissolve on a real calendar (q2/q83) or a freely tunable
    # second fixture (q23b/q24/q41/q54/q85) run here too.
    "store_returns": 1500,
    "catalog_returns": 1500,
    "web_returns": 1500,
    "web_page": 30,
    "reason": 15,
    "inventory": 3000,
    "warehouse": 15,
    "income_band": 20,
}

_EPOCH = datetime.date(1998, 1, 1)
_JDN_BASE = 2450815              # JDN of 1998-01-01
_DAYS = 1826

_DAY_NAMES = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
              "Saturday", "Sunday"]

# (category, class, brand, color, units, size) tuples covering every
# modified-query list as CO-OCCURRING values: q53/q63's two OR-groups
# (Books/Children/Electronics x personal/portable/reference/self-help x
# scholaramalgamalg #14/#7/#9 + exportiunivamalg #9; Women/Music/Men x
# accessories/classical/fragrances/pants x amalgimporto #1/
# edu packscholar #1/exportiimporto #1/importoamalg #1), q98/q89's
# (Home/Books/Electronics x wallpaper/parenting/musical; Shoes/Jewelry/
# Men x womens/birdal/pants) -- and, for the v1.4 texts run on this
# calendar fixture, q41's (Women x powder|khaki x Ounce|Oz x
# medium|extra large) and (Men x floral x N/A|Dozen x petite|large)
# arms, q24a's 'pale', q24b's 'chiffon', and q54's (Women, maternity).
_MOD_ITEM_TRIPLES = [
    ("Books", "personal", "scholaramalgamalg #14", "pale", "Unknown", "small"),
    ("Children", "portable", "scholaramalgamalg #7", "chiffon", "Box", "large"),
    ("Electronics", "reference", "exportiunivamalg #9", "slate", "Carton", "N/A"),
    ("Books", "self-help", "scholaramalgamalg #9", "brown", "Gram", "petite"),
    ("Women", "accessories", "amalgimporto #1", "powder", "Ounce", "medium"),
    ("Music", "classical", "edu packscholar #1", "aquamarine", "Case", "small"),
    ("Men", "pants", "exportiimporto #1", "floral", "Dozen", "petite"),
    ("Women", "fragrances", "importoamalg #1", "khaki", "Oz", "extra large"),
    ("Home", "wallpaper", "glassy #4", "blanched", "Tsp", "N/A"),
    ("Books", "parenting", "scholaramalgamalg #8", "azure", "Bundle", "small"),
    ("Electronics", "musical", "exportiunivamalg #3", "misty", "Gross", "medium"),
    ("Shoes", "womens", "edu packedu pack #1", "peach", "Each", "large"),
    ("Jewelry", "birdal", "amalgamalg #5", "metallic", "Pallet", "small"),
    ("Women", "maternity", "amalgmaxi #3", "spring", "Tbl", "medium"),
]

_NT = len(_MOD_ITEM_TRIPLES)

# Shared zip vocabulary: q24a/b equi-join s_zip = ca_zip, while modified
# q19 needs pairs whose 5-digit prefixes DIFFER -- a 10-value store list
# inside a 15-value address list gives both in volume.
_ZIPS10 = [str(24000 + j * 37) for j in range(10)]
_ZIPS15 = _ZIPS10 + [str(76000 + j * 41) for j in range(5)]

# 16 states: q85's three (state-list x profit-band) arms at slots spread
# across the cycle, plus AL/SD/TN at slots 1/5/7 so Williamson-County
# addresses (rows r % 6 == 5, hence r % 16 odd) can equal a
# Williamson-County store's state for q54's ca_county = s_county AND
# ca_state = s_state join.
_STATES16 = ["IN", "AL", "OH", "NJ", "WI", "SD", "CT", "TN",
             "KY", "LA", "IA", "AR", "MS", "ND", "GA", "OK"]

# Banded store_sales slice: rows 0..985 form 58 blocks of 17 rows.  Each
# block is one (ticket, customer) pair with ONE fixed store and hdemo and
# a 17-date calendar list, so q34's per-group count is exactly 17 (its
# 15..20 band) while only the two dom<=2 dates survive q73's d_dom
# BETWEEN 1 AND 2 (its 1..5 band).  Rows >= 986 are one-row tickets, so
# they populate q46/q68/q79's per-ticket groups and stay out of q34's
# band.  hdemo sk 29 = row 28: dep_count 8, vehicle_count 3,
# buy_potential '>10000' -- passes every modified hd predicate
# (8/3 > 1.2 ratio included).
_BAND_ROWS = 986
_BAND = 17


def _band_dates() -> list[int]:
    dates = [
        (1998, 2, 1), (1998, 3, 25), (1998, 4, 26), (1998, 5, 27),
        (1998, 6, 28), (1998, 7, 25), (1998, 8, 26), (1998, 9, 27),
        (1998, 10, 28), (1998, 12, 3), (1999, 2, 1), (1999, 3, 25),
        (1999, 5, 26), (1999, 7, 27), (1999, 9, 28), (2000, 3, 25),
        (2000, 5, 3),
    ]
    return [
        _JDN_BASE + (datetime.date(y, m, d) - _EPOCH).days
        for (y, m, d) in dates
    ]


_BAND_DATES = _band_dates()

# q83's three exact catalog dates; its week-subquery widens each to the
# containing (Monday-aligned) week.  A quarter of all return rows land
# uniformly inside those 21 days so every item shows returns in all
# three channels (q83 inner-joins the per-channel item sums).
_Q83_WEEK_DAYS = [
    _JDN_BASE + (d - _EPOCH).days - d.weekday() + off
    for d in (datetime.date(2000, 6, 30), datetime.date(2000, 9, 27),
              datetime.date(2000, 11, 17))
    for off in range(7)
]


def _returned_date(i: int, col: str) -> int:
    # Store-return rows 0..19 are the q17 slice's returns: 2001Q1.
    if col == "sr_returned_date_sk" and i < 20:
        return _jdn_day(2001, 3, 1) + i
    if _mix(i, col + "_pick") % 4 == 0:
        return _Q83_WEEK_DAYS[_mix(i, col) % len(_Q83_WEEK_DAYS)]
    return _jdn_mix(i, col)


def _jdn_mix(i: int, col: str) -> int:
    return _JDN_BASE + _mix(i, col) % _DAYS


def _jdn_day(y: int, m: int, d: int) -> int:
    return _JDN_BASE + (datetime.date(y, m, d) - _EPOCH).days


MOD_SPECIAL = {
    # --- item: vocabularies sized so every filter conjunction in the
    # modified set is populated (managers 1/7/48, manufact 436 for
    # modified q3 + 738 in q41's [738, 778] band, the tuple lists above).
    "i_category": lambda i: _MOD_ITEM_TRIPLES[i % _NT][0],
    "i_class": lambda i: _MOD_ITEM_TRIPLES[i % _NT][1],
    "i_brand": lambda i: _MOD_ITEM_TRIPLES[i % _NT][2],
    "i_color": lambda i: _MOD_ITEM_TRIPLES[i % _NT][3],
    "i_units": lambda i: _MOD_ITEM_TRIPLES[i % _NT][4],
    "i_size": lambda i: _MOD_ITEM_TRIPLES[i % _NT][5],
    "i_brand_id": lambda i: 1 + i % 15,
    "i_category_id": lambda i: 1 + i % 8,
    "i_class_id": lambda i: 1 + i % 16,
    "i_manager_id": lambda i: [1, 7, 48, 20][i % 4],
    "i_manufact_id": lambda i: [436, 738, 107, 12, 500, 88][i % 6],
    # Small manufact vocabulary so q41's correlated same-manufact count
    # finds the combo items (item 7 = Women/khaki/Oz/extra large has
    # manufact_id 738 AND manu_7).
    "i_manufact": lambda i: f"manu_{i % 10}",
    # Every price inside q64's double BETWEEN (65..74 intersection).
    "i_current_price": lambda i: 65.0 + (i % 36) / 4.0,
    # Unique item_ids for the q58 slice items (sks 21..25) so their
    # per-item_id channel revenues do not aggregate across distinct
    # items; everything else keeps the 20-value cycle (modified q27's
    # result must stay under its LIMIT boundary).
    "i_item_id": lambda i: (
        f"item_{i:04d}" if 20 <= i < 25 else f"i_item_id_{i % 20}"),
    # --- store
    "s_city": lambda i: ["Midway", "Fairview", "Concord", "Spring Hill",
                         "Brownsville", "Greenville"][i % 6],
    "s_county": lambda i: [
        "Saginaw County", "Sumner County", "Appanoose County",
        "Daviess County", "Fairfield County", "Raleigh County",
        "Ziebach County", "Williamson County", "Bronx County",
        "Barrow County"][i % 10],
    "s_state": lambda i: ["TN", "AL", "SD"][i % 3],
    "s_number_employees": lambda i: 200 + (i * 7) % 96,
    "s_gmt_offset": lambda i: -5.0 if i % 2 == 0 else -6.0,
    "s_zip": lambda i: _ZIPS10[i % 10],
    "s_market_id": lambda i: [8, 7, 5, 10][i % 4],
    # --- household_demographics
    "hd_dep_count": lambda i: i % 10,
    "hd_vehicle_count": lambda i: i % 5,
    "hd_buy_potential": lambda i: [">10000", "1001-5000", "Unknown",
                                   "0-500"][i % 4],
    # --- customer_demographics (q7 needs F/D/Primary, q27 F/W/Primary
    # as CO-OCCURRING triples).
    "cd_gender": lambda i: ["F", "F", "M", "F", "M", "F", "M"][i % 7],
    "cd_marital_status": lambda i: ["D", "W", "M", "S", "U", "M",
                                    "D"][i % 7],
    "cd_education_status": lambda i: [
        "Primary", "Primary", "4 yr Degree", "College", "Unknown",
        "Advanced Degree", "Secondary"][i % 7],
    # --- customer_address (q10's county list at 5 of 6 cycle slots;
    # cities diverse for q46/q68's bought<>current inequality; slot 5 =
    # Williamson County, shared with the store county cycle for q54's
    # address = store geography join).
    "ca_county": lambda i: ["Walker County", "Richland County",
                            "Gaines County", "Dona Ana County",
                            "Douglas County", "Williamson County"][i % 6],
    "ca_city": lambda i: ["Edgewood", "Fairview", "Midway",
                          "Pleasant Hill", "Centerville"][i % 5],
    "ca_zip": lambda i: _ZIPS15[i % 15],
    "ca_state": lambda i: _STATES16[i % 16],
    "ca_country": lambda i: "United States",
    # --- customer: half the base born in 'UNITED STATES' =
    # upper(ca_country), q24a/b's birth-country equi-join.
    "c_birth_country": lambda i: (
        "UNITED STATES" if i % 2 == 0 else f"BIRTH_{i % 7}"),
    # Customer 5 lives at address sk 6 (row 5: Williamson County, SD) --
    # the same (county, state) as store 17, closing q54's
    # my_customers -> my_revenue geography join for the pinned
    # December-1998 maternity buyer.
    "c_current_addr_sk": lambda i: {4: 6}.get(
        i, 1 + _mix(i, "c_current_addr_sk") % 60),
    # --- promotion (q7: email = 'N' OR event = 'N')
    "p_channel_email": lambda i: "NY"[i % 2],
    "p_channel_event": lambda i: "YN"[(i // 2) % 2],
    # --- store_sales: banded slice + hot item-day slice + generic tail
    # (see _BAND_ROWS note).  Rows 986..1085 are the hot slice: ten
    # (item k+1, 2000-03-(k+1)) pairs with ten rows each, so q23b's
    # frequent_ss_items HAVING count(*) > 4 is populated on the v1.4
    # calendar run; their one-row tickets keep them out of q34's
    # 15..20 band.
    "ss_ticket_number": lambda i: (
        1 + i // _BAND if i < _BAND_ROWS else 1000 + (i - _BAND_ROWS)),
    "ss_customer_sk": lambda i: (
        1 + (i // _BAND) % 60 if i < _BAND_ROWS
        else 1 + (i - 1086) if 1086 <= i < 1106
        else 1 + _mix(i, "ss_customer_sk") % 60),
    "ss_hdemo_sk": lambda i: (
        29 if i < _BAND_ROWS else 1 + _mix(i, "ss_hdemo_sk") % 60),
    "ss_store_sk": lambda i: (
        1 + (i // _BAND) % 30 if i < _BAND_ROWS
        else 1 + _mix(i, "ss_store_sk") % 30),
    # Rows 1086..1105 are the q17 slice: twenty 2001Q1 sales of items
    # 1..20 by customers 1..20, mirrored by store_returns rows 0..19
    # (returned in 2001Q1) and re-bought from the catalog in 2001Q2
    # (catalog rows 50..69) -- q17's three-quarter funnel.
    "ss_item_sk": lambda i: (
        1 + (i - _BAND_ROWS) // 10 if _BAND_ROWS <= i < _BAND_ROWS + 100
        else 1 + (i - 1086) if 1086 <= i < 1106
        else 21 + (i - 1106) // 6 if 1106 <= i < 1136
        else 1 + _mix(i, "ss_item_sk") % 60),
    "ss_sold_date_sk": lambda i: (
        _BAND_DATES[i % _BAND] if i < _BAND_ROWS
        else _jdn_day(2000, 3, 1 + (i - _BAND_ROWS) // 10)
        if i < _BAND_ROWS + 100
        else _jdn_day(2001, 1, 15) + (i - 1086) if 1086 <= i < 1106
        else _jdn_day(2000, 1, 3) + (i - 1106) % 6 if 1106 <= i < 1136
        else None if i % 89 == 0
        else _jdn_mix(i, "ss_sold_date_sk")),
    # --- store_returns mirror sales rows on (ticket, item, customer):
    # return row i refunds sales row j = 4i mod 8000, so q24a/b's
    # ss = sr two-column join is populated (independent draws make a
    # (ticket, item) equality structurally empty).
    # Multiples of 50: q54 computes cast(revenue / 50 AS INT), and the
    # two engines disagree on fractional casts (Spark truncates, DuckDB
    # rounds) -- sums of 50-multiples make the division exact.  Rows
    # 1106..1135 are the q58 slice: items 21..25 sold six times in the
    # week of 2000-01-03 at 50,000 each, in ALL three channels (catalog
    # rows 70..99, web rows 0..29 mirror the same pattern), so the
    # pinned 300,000 per channel dominates any generic same-week noise
    # row (<= 19,950) and every cross-channel revenue ratio stays
    # within q58's [0.9, 1.1] bands.
    "ss_ext_sales_price": lambda i: (
        50000.0 if 1106 <= i < 1136 else 50.0 * ((i * 137 + 7) % 400)),
    # (return rows 0..19 mirror the q17 slice instead of the 4i rule)
    "sr_ticket_number": lambda i: MOD_SPECIAL["ss_ticket_number"](
        1086 + i if i < 20 else (i * 4) % 8000),
    "sr_item_sk": lambda i: MOD_SPECIAL["ss_item_sk"](
        1086 + i if i < 20 else (i * 4) % 8000),
    "sr_customer_sk": lambda i: MOD_SPECIAL["ss_customer_sk"](
        1086 + i if i < 20 else (i * 4) % 8000),
    # --- web/catalog channel populations: proper subsets of the
    # customer base (q10's two semi joins).  Catalog rows 0..29 are
    # pinned to (hot item, Feb 2000) for q23b's catalog arm and rows
    # 30..49 to (maternity item 14, Dec 1998, customer 5) for q54's
    # my_customers seed.
    "ws_bill_customer_sk": lambda i: 1 + _mix(i, "ws_bill_customer_sk") % 30,
    "cs_ship_customer_sk": lambda i: 1 + _mix(i, "cs_ship_customer_sk") % 40,
    "cs_bill_customer_sk": lambda i: (
        1 + i % 40 if i < 30 else 5 if i < 50
        else 1 + (i - 50) if i < 70
        else 1 + _mix(i, "cs_bill_customer_sk") % 40),
    "cs_item_sk": lambda i: (
        1 + i % 10 if i < 30 else 14 if i < 50
        else 1 + (i - 50) if i < 70
        else 21 + (i - 70) // 6 if i < 100
        else 1 + _mix(i, "cs_item_sk") % 60),
    "cs_sold_date_sk": lambda i: (
        _jdn_day(2000, 2, 1 + i % 28) if i < 30
        else _jdn_day(1998, 12, 1 + i % 31) if i < 50
        else _jdn_day(2001, 5, 1) + (i - 50) if i < 70
        else _jdn_day(2000, 1, 3) + (i - 70) % 6 if i < 100
        else _jdn_mix(i, "cs_sold_date_sk")),
    "cs_ext_sales_price": lambda i: (
        50000.0 if 70 <= i < 100 else ((i * 137 + 4001) % 19997) / 4.0),
    "ws_item_sk": lambda i: (
        21 + i // 6 if i < 30 else 1 + _mix(i, "ws_item_sk") % 60),
    "ws_sold_date_sk": lambda i: (
        _jdn_day(2000, 1, 3) + i % 6 if i < 30
        else _jdn_mix(i, "ws_sold_date_sk")),
    "ws_ext_sales_price": lambda i: (
        50000.0 if i < 30 else ((i * 139 + 5003) % 19997) / 4.0),
    # --- inventory: rows 0..79 are the q39 slice -- warehouse 1, items
    # 1..10, four snapshots per month in Jan and Feb 2001 with
    # quantities [0, 0, 0, 30]: mean 7.5, stddev_samp exactly 15.0
    # (variance 225 is integer-exact in ANY accumulation order, so the
    # usual cross-engine stddev drift cannot appear), cov = 2 -- above
    # both q39a's > 1 and q39b's > 1.5 thresholds in both months.
    "inv_warehouse_sk": lambda i: (
        1 if i < 80 else 1 + _mix(i, "inv_warehouse_sk") % 15),
    "inv_item_sk": lambda i: (
        1 + i // 8 if i < 80 else 1 + _mix(i, "inv_item_sk") % 60),
    "inv_date_sk": lambda i: (
        _jdn_day(2001, 1 + (i % 8) // 4, 3 + (i % 4) * 7) if i < 80
        else _jdn_mix(i, "inv_date_sk")),
    "inv_quantity_on_hand": lambda i: (
        (30 if i % 4 == 3 else 0) if i < 80
        else (i * 7 + 13) % 100),
    # 20-line order numbers on both channels; the returns mirror them on
    # (order, item) the same way store_returns mirrors tickets, closing
    # q85's ws = wr join (and q64's cs = cr refund subquery).
    "ws_order_number": lambda i: 1 + i // 20,
    "cs_order_number": lambda i: 1 + i // 20,
    "wr_order_number": lambda i: 1 + ((i * 4) % 1500) // 20,
    "wr_item_sk": lambda i: MOD_SPECIAL["ws_item_sk"]((i * 4) % 1500),
    "cr_order_number": lambda i: 1 + ((i * 4) % 1500) // 20,
    "cr_item_sk": lambda i: MOD_SPECIAL["cs_item_sk"]((i * 4) % 1500),
    # q85 equates the refunding and returning demographics row-wise
    # (cd1.status = cd2.status); drawing ONE sk for both sides makes the
    # equality hold on every returned line.
    "wr_refunded_cdemo_sk": lambda i: 1 + _mix(i, "wr_cdemo") % 60,
    "wr_returning_cdemo_sk": lambda i: 1 + _mix(i, "wr_cdemo") % 60,
    # Refund components an order of magnitude below list prices, so
    # q64's cs_ui HAVING sale > 2 * refund keeps its items.
    "cr_refunded_cash": lambda i: ((i * 137 + 13) % 797) / 4.0,
    "cr_reversed_charge": lambda i: ((i * 139 + 29) % 797) / 4.0,
    "cr_store_credit": lambda i: ((i * 149 + 41) % 797) / 4.0,
    # All web profits and sales prices inside q85's band unions
    # (profit 50..250, price 50..200), so each (demographic x price,
    # state x profit) OR-arm keeps a population.
    "ws_net_profit": lambda i: 50.0 + ((i * 13) % 800) / 4.0,
    "ws_sales_price": lambda i: 50.0 + ((i * 11) % 600) / 4.0,
    # --- returns: dates concentrated on q83's three weeks (see
    # _Q83_WEEK_DAYS).
    "sr_returned_date_sk": lambda i: _returned_date(i, "sr_returned_date_sk"),
    "cr_returned_date_sk": lambda i: _returned_date(i, "cr_returned_date_sk"),
    "wr_returned_date_sk": lambda i: _returned_date(i, "wr_returned_date_sk"),
    # Multiples of 3, so q83's (sr+cr+wr)/3.0 cross-channel average is an
    # exact integer on both engines (Spark's DECIMAL division rounds to
    # 6 fractional digits, DuckDB computes a double; integers agree).
    "sr_return_quantity": lambda i: 3 * ((i * 7 + 11) % 33),
    "cr_return_quantity": lambda i: 3 * ((i * 11 + 5) % 33),
    "wr_return_quantity": lambda i: 3 * ((i * 13 + 7) % 33),
}

_MOD_PK = {
    "date_dim": "d_date_sk",
    "item": "i_item_sk",
    "store": "s_store_sk",
    "customer": "c_customer_sk",
    "customer_address": "ca_address_sk",
    "customer_demographics": "cd_demo_sk",
    "household_demographics": "hd_demo_sk",
    "promotion": "p_promo_sk",
    "warehouse": "w_warehouse_sk",
    "reason": "r_reason_sk",
    "income_band": "ib_income_band_sk",
    "web_page": "wp_web_page_sk",
}

_MOD_FK_SIZES = [
    ("_item_sk", 60),
    ("_customer_sk", 60),
    ("_cdemo_sk", 60),
    ("_hdemo_sk", 60),
    ("_addr_sk", 60),
    ("_store_sk", 30),
    ("_promo_sk", 30),
    ("_warehouse_sk", 15),
    ("_ship_mode_sk", 15),
    ("_mode_sk", 15),
    ("_income_band_sk", 20),
    ("_page_sk", 30),
    ("_site_sk", 15),
]


def _date_dim_cell(col: str, typ: str, i: int):
    day = _EPOCH + datetime.timedelta(days=i)
    if col == "d_date_sk":
        return _JDN_BASE + i
    if col == "d_date":
        return pd.Timestamp(day)
    if col == "d_year":
        return day.year
    if col == "d_moy":
        return day.month
    if col == "d_dom":
        return day.day
    if col == "d_qoy":
        return 1 + (day.month - 1) // 3
    if col == "d_dow":
        return day.weekday()
    if col == "d_day_name":
        return _DAY_NAMES[day.weekday()]
    if col == "d_week_seq":
        # Monday-aligned weeks from the epoch week; "same week last
        # year" = seq - 52 pairs days exactly 364 apart, the TPC-DS
        # q59 convention.
        return ((_JDN_BASE + i) - (_JDN_BASE - _EPOCH.weekday())) // 7 + 1
    if col == "d_month_seq":
        return (day.year - 1900) * 12 + day.month - 1
    if col == "d_quarter_name":
        return f"{day.year}Q{1 + (day.month - 1) // 3}"
    return _generic_cell("date_dim", col, typ, i)


def _generic_cell(table: str, col: str, typ: str, i: int):
    t = typ.upper()
    if t.startswith("DECIMAL"):
        # Quarter-valued: exact dyadic sums in any accumulation order
        # (same rationale as the v1.4 fixture).
        return ((i * 137 + len(col) * 997) % 19997) / 4.0
    if t in ("INT", "BIGINT", "SMALLINT"):
        return (i * 7 + len(col)) % 100
    if t == "DATE":
        return pd.Timestamp(_EPOCH) + pd.Timedelta(days=(i % _DAYS))
    if t == "STRING":
        return f"{col}_{i % 20}"
    if t == "DOUBLE":
        return ((i * 31 + len(col)) % 1000) / 10.0
    raise AssertionError(f"unhandled type {typ} for {table}.{col}")


def _gen_cell_mod(table: str, col: str, typ: str, i: int):
    if table == "date_dim":
        return _date_dim_cell(col, typ, i)
    if col in MOD_SPECIAL:
        return MOD_SPECIAL[col](i)
    if col == _MOD_PK.get(table):
        return i + 1
    if col.endswith("_date_sk"):
        return _jdn_mix(i, col)
    if col.endswith("_time_sk"):
        return 1 + _mix(i, col) % 60
    if col.endswith("_sk"):
        size = next((n for suf, n in _MOD_FK_SIZES if col.endswith(suf)), 60)
        return 1 + _mix(i, col) % size
    return _generic_cell(table, col, typ, i)


@pytest.fixture(scope="module")
def tpcds_mod_data(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tpcds_mod_exec")
    cols_by_table = _ddl_columns()
    paths = {}
    for table, n in MOD_TABLES.items():
        cols = cols_by_table[table]
        data = {
            col: [_gen_cell_mod(table, col, typ, i) for i in range(n)]
            for col, typ in cols
        }
        pdf = pd.DataFrame(data)
        for col, typ in cols:
            if typ.upper() == "DATE":
                pdf[col] = pd.to_datetime(pdf[col]).dt.date
            elif (typ.upper() in ("INT", "BIGINT", "SMALLINT")
                  and pdf[col].isna().any()):
                pdf[col] = pdf[col].astype("Int64")
        path = str(root / f"{table}.parquet")
        pdf.to_parquet(path)
        paths[table] = path
        spark.read.parquet(path).createOrReplaceTempView(f"mod_{table}")
    # The query texts use the bare table names; register them as views
    # over the mod_ parquet (a separate SparkSession temp-view namespace
    # per name would collide with test_tpcds_execution's module fixture
    # if both are live, so the bare names are (re)bound here and the
    # other module rebinds on its own setup).
    for table in MOD_TABLES:
        spark.read.parquet(paths[table]).createOrReplaceTempView(table)
    yield paths
    for table in MOD_TABLES:
        spark.catalog.dropTempView(table)
        spark.catalog.dropTempView(f"mod_{table}")


def _run_both_mod(spark, paths: dict, sql: str, label: str) -> None:
    bind_views(spark, paths)  # overlapping-name safety: see oracle_harness
    spark_pdf = spark.sql(sql).toPandas()
    con = duckdb.connect()
    try:
        for table, path in paths.items():
            con.execute(
                f'CREATE VIEW "{table}" AS '
                f"SELECT * FROM read_parquet('{path}')"
            )
        # Lexical transforms only: Spark spells `left semi join`,
        # DuckDB spells the identical operator `semi join`; q77's bare
        # `returns` column alias is a reserved word for DuckDB's parser
        # (quote it); q72's final ORDER BY d_week_seq resolves to the
        # SELECT-list output column (d1.d_week_seq) under Spark's
        # resolution order, which DuckDB's stricter binder needs spelled
        # out.
        duck_sql = sql.replace("`", '"')
        duck_sql = re.sub(r"\bleft\s+semi\s+join\b", "semi join",
                          duck_sql, flags=re.IGNORECASE)
        duck_sql = re.sub(r'(?<!")\breturns\b(?!")', '"returns"', duck_sql)
        duck_sql = duck_sql.replace(
            "i_item_desc, w_warehouse_name, d_week_seq",
            "i_item_desc, w_warehouse_name, d1.d_week_seq")
        # q58: ORDER BY item_id resolves to the output column
        # (ss_items.item_id) in Spark; the three item_ids are equi-joined
        # so the qualification cannot change the ordering.
        duck_sql = duck_sql.replace(
            "ORDER BY item_id, ss_item_rev",
            "ORDER BY ss_items.item_id, ss_item_rev")
        duck_pdf = con.execute(duck_sql).fetchdf()
    finally:
        con.close()
    assert len(spark_pdf) > 0, f"{label}: empty result -- fixture too sparse"
    problems = compare_frames(_positional(spark_pdf), _positional(duck_pdf))
    assert not problems, f"{label}: " + "; ".join(problems)


@pytest.mark.parametrize("name", MOD_QUERIES)
def test_tpcds_modified_query_executes_exactly(spark, tpcds_mod_data, name):
    with open(os.path.join(RES_MOD, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    _run_both_mod(spark, tpcds_mod_data, sql, f"modified/{name}")


# v1.4 texts whose blockers on the shared fixture dissolve here
# (test_tpcds_execution's absence accounting):
#  - real-calendar structure: q2 (week-53 year-over-year offset
#    2001->2002), q83 (three exact calendar dates);
#  - multi-channel funnels: q14b (store/catalog/web INTERSECT over
#    aligned week_seqs), q23b (frequent items + best customers),
#    q24a/q24b (sales = returns ticket mirror + zip/birth-country
#    equi-joins), q64 (two-year cross-sales self-join);
#  - conjunction density: q41 (manufact x color/units/size combos),
#    q54 (maternity buyers + address = store geography), q85
#    (demographic x price and state x profit OR-arms);
#  - stddev class: q17, q39a, q39b -- the [0, 0, 0, 30] inventory
#    snapshots and count<=2 quantity groups make every variance an
#    exact integer (stddev_samp 15.0, cov 2), so the usual
#    accumulation-order drift has no bits to disagree on;
#  - DuckDB binder/parser strictness, resolved by the documented
#    lexical transforms in _run_both_mod: q58 (ORDER BY item_id),
#    q72 (ORDER BY d_week_seq), q77 (`returns` alias) -- plus the q58
#    slice (items 21..25 sold in the week of 2000-01-03 in all three
#    channels at a dominating 50,000/row) for its +-10% revenue bands.
RES_V14 = "/root/reference/sql/core/src/test/resources/tpcds"
V14_CALENDAR_QUERIES = [
    "q2", "q14b", "q17", "q23b", "q24a", "q24b", "q39a", "q39b",
    "q41", "q54", "q58", "q64", "q72", "q77", "q83", "q85",
]


@pytest.mark.parametrize("name", V14_CALENDAR_QUERIES)
def test_tpcds_v14_calendar_query_executes_exactly(spark, tpcds_mod_data,
                                                   name):
    with open(os.path.join(RES_V14, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    _run_both_mod(spark, tpcds_mod_data, sql, f"v1.4-calendar/{name}")


# The v2.7 variants of the same funnel shapes unlock identically
# (q72's 2001/'1001-5000'/'M' needle sits in the same cycles).
RES_V27 = "/root/reference/sql/core/src/test/resources/tpcds-v2.7.0"
V27_CALENDAR_QUERIES = ["q14", "q24", "q64", "q72"]


@pytest.mark.parametrize("name", V27_CALENDAR_QUERIES)
def test_tpcds_v27_calendar_query_executes_exactly(spark, tpcds_mod_data,
                                                   name):
    with open(os.path.join(RES_V27, f"{name}.sql"), encoding="utf-8") as fh:
        sql = fh.read()
    _run_both_mod(spark, tpcds_mod_data, sql, f"v2.7-calendar/{name}")
