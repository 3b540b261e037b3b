"""TPC-DS q32: the malformed-date-literal absence, closed (r06 verdict #6).

The public v1.4 text (reference:
sql/core/src/test/resources/tpcds/q32.sql:13) spells the correlated
subquery's window start as ``'2000-01-27]'`` -- a stray ``]`` inside the
date literal. Measured engine behavior on that published byte sequence:

- ANSI Spark (4.x default): CAST_INVALID_INPUT -- the text does not run.
- Legacy/2.4-era Spark (``spark.sql.ansi.enabled=false``, the reference's
  vintage): the cast silently folds to NULL, the BETWEEN becomes NULL,
  the correlated average sees zero rows, and the query returns ZERO rows
  on ANY data -- the published text never computed anything.
- DuckDB: in isolation ``CAST('2000-01-27]' AS DATE)`` parses leniently,
  but in the query the BETWEEN's upper bound (DATE + INTERVAL) is a
  TIMESTAMP, the comparison coerces to the strict TIMESTAMP parser, and
  the published bytes throw a ConversionException.

No modern engine runs the text as shipped, and the one engine vintage
that accepts it (2.4-era NULL-folding) computes nothing. The honest
execution gate is therefore: BOTH engines run the text with the
documented ONE-CHARACTER deletion (drop the stray ``]``) and must match
value-exactly. That is what ``test_q32_corrected_text_value_exact``
does, on a dedicated fixture
(same discipline as test_tpcds_decimal_execution's q18 fixture) built so
the correlated-average window actually discriminates:

- items 1..3 carry the query's ``i_manufact_id = 977``;
- each item sells 5 times inside the 90-day window with discounts
  (10, 10, 10, 10, 100): window average 28.0 exactly, threshold
  1.3 * 28 = 36.4, so precisely ONE sale per item qualifies;
- each item also sells outside the window at discount 500.0 -- if the
  subquery's date restriction leaked, the average would jump to ~162.9
  and the qualifying rows would vanish, so the fixture proves the window
  is applied, not just that the join compiles.

The two as-published tests pin the before state so the transform stays
documented, not assumed.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
import pytest

from tests.oracle_harness import bind_views, compare_frames
from tests.test_tpcds_execution import _positional

RES = "/root/reference/sql/core/src/test/resources/tpcds"

pytestmark = [
    pytest.mark.slow,  # r13: execution-twin lane (VERDICT r12 item 2)
    pytest.mark.skipif(
        not os.path.isdir(RES), reason="reference resources not available"
    ),
    # Binds the bare catalog_sales/item/date_dim names, like the other
    # TPC-DS execution modules: same xdist group, and bind_views() at
    # every execution for in-process ordering independence.
    pytest.mark.xdist_group("tpcds_bare_views"),
]

_WINDOW_START = datetime.date(2000, 1, 27)


def _q32_text() -> str:
    with open(os.path.join(RES, "q32.sql"), encoding="utf-8") as fh:
        return fh.read()


@pytest.fixture(scope="module")
def q32_data(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tpcds_q32_exec")

    days = [datetime.date(1999, 12, 1) + datetime.timedelta(days=k) for k in range(200)]
    date_dim = pd.DataFrame(
        {"d_date_sk": [2451513 + k for k in range(200)], "d_date": days}
    )

    item = pd.DataFrame(
        {
            "i_item_sk": list(range(1, 11)),
            "i_manufact_id": [977 if sk <= 3 else 100 + sk for sk in range(1, 11)],
        }
    )

    in_window = [datetime.date(2000, 2, d) for d in (1, 2, 3, 4, 5)]
    out_window = datetime.date(1999, 12, 15)
    rows = []
    for sk in range(1, 11):
        for d, amt in zip(in_window, (10.0, 10.0, 10.0, 10.0, 100.0)):
            rows.append((sk, 2451513 + (d - days[0]).days, amt))
        rows.append((sk, 2451513 + (out_window - days[0]).days, 500.0))
    catalog_sales = pd.DataFrame(
        rows, columns=["cs_item_sk", "cs_sold_date_sk", "cs_ext_discount_amt"]
    )

    paths = {}
    for name, pdf in (
        ("date_dim", date_dim),
        ("item", item),
        ("catalog_sales", catalog_sales),
    ):
        path = str(root / f"{name}.parquet")
        pdf.to_parquet(path)
        paths[name] = path
    yield paths


def _duck(paths: dict, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for table, path in paths.items():
            con.execute(
                f'CREATE VIEW "{table}" AS SELECT * FROM read_parquet(\'{path}\')'
            )
        return con.execute(sql.replace("`", '"')).fetchdf()
    finally:
        con.close()


def test_q32_as_published_ansi_spark_refuses(spark, q32_data):
    """On the published bytes, ANSI Spark throws CAST_INVALID_INPUT for
    the '2000-01-27]' literal -- the text is unrunnable as shipped."""
    bind_views(spark, q32_data)
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|2000-01-27"):
        spark.sql(_q32_text()).collect()


def test_q32_as_published_legacy_spark_returns_nothing(spark, q32_data):
    """Under the reference's 2.4-era semantics (ansi off), the malformed
    literal folds to NULL, so the published text returns ZERO rows on a
    fixture where the corrected text returns 3 -- the query as shipped
    never computed anything."""
    bind_views(spark, q32_data)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert spark.sql(_q32_text()).count() == 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_q32_as_published_duckdb_refuses(q32_data):
    """DuckDB also refuses the published bytes: the BETWEEN's upper
    bound (DATE + INTERVAL = TIMESTAMP) pulls the malformed literal
    through the strict TIMESTAMP parser."""
    with pytest.raises(duckdb.ConversionException, match="2000-01-27"):
        _duck(q32_data, _q32_text())


def test_q32_corrected_text_value_exact(spark, q32_data):
    """Both engines on the one-character-corrected text, value-exact,
    non-empty."""
    published = _q32_text()
    corrected = published.replace("'2000-01-27]'", "'2000-01-27'")
    assert corrected != published  # the transform is exactly one deletion

    bind_views(spark, q32_data)
    spark_pdf = spark.sql(corrected).toPandas()
    duck_pdf = _duck(q32_data, corrected)

    # One qualifying sale for each of the three manufact-977 items; the
    # out-of-window 500.0 sales prove the correlated average is windowed.
    assert len(spark_pdf) == 3
    problems = compare_frames(_positional(spark_pdf), _positional(duck_pdf))
    assert not problems, "q32: " + "; ".join(problems)
