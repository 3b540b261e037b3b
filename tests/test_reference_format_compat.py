"""Read the reference's format edge-case files with OUR reader stack.

The reference ships the actual fixture files its reader suites chew on
(sql/core/src/test/resources/test-data/: legacy parquet physical
encodings from parquet-thrift/protobuf/old parquet-avro writers,
decimals stored as INT32/INT64/FIXED_LEN_BYTE_ARRAY, Impala INT96
timestamps, TIMESTAMP_MILLIS, and the CSVSuite.scala cars-* family of
malformed/quoted/charset variants).  test_sources.py proves our
readers on SYNTHETIC roundtrips; this module proves them on the
reference's own bytes:

 - every compat parquet file is read by Spark AND DuckDB and the row
   sets compared value-for-value (nested lists/structs normalised to
   canonical JSON) -- two independent parquet decoders agreeing on
   legacy encodings;
 - every cars-*.csv is read with the same options the reference's
   CSVSuite uses (delimiter, quote, comment, charset, nullValue,
   permissive/dropmalformed/failfast) and checked against the known
   file content.

Reference parity: CSVSuite.scala, ParquetThriftCompatibilitySuite,
ParquetProtobufCompatibilitySuite, ParquetIOSuite (decimal physical
types), ParquetInteroperabilitySuite (INT96).
"""
from __future__ import annotations

import datetime
import decimal
import json
import os

import duckdb
import pytest
from py4j.protocol import Py4JJavaError
from pyspark.errors import PySparkException

TD = "/root/reference/sql/core/src/test/resources/test-data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TD), reason="reference resources not available"
)

PARQUET_COMPAT = [
    "dec-in-i32.parquet",
    "dec-in-i64.parquet",
    "dec-in-fixed-len.parquet",
    "timemillis-in-i64.parquet",
    "impala_timestamp.parq",
    "parquet-1217.parquet",
    "nested-array-struct.parquet",
    "old-repeated-int.parquet",
    "old-repeated-message.parquet",
    "proto-repeated-string.parquet",
    "proto-repeated-struct.parquet",
    "proto-struct-with-array.parquet",
    "proto-struct-with-array-many.parquet",
    "parquet-thrift-compat.snappy.parquet",
]


def _norm(v):
    if isinstance(v, dict):
        if (set(v) == {"key", "value"} and isinstance(v["key"], list)
                and isinstance(v["value"], list)
                and len(v["key"]) == len(v["value"])):
            # DuckDB surfaces parquet MAPs as a {key: [...], value:
            # [...]} struct-of-arrays; Spark gives a Python dict.
            # Rebuild the mapping so both compare as {str(k): v}.
            return {str(_norm(k)): _norm(x)
                    for k, x in zip(v["key"], v["value"])}
        if len(v) == 1:
            # Legacy repeated groups without a LIST annotation are
            # ambiguous per the parquet LogicalTypes spec: Spark keeps
            # the single-field group ([{someId: 3}]), DuckDB unwraps it
            # ([3]).  Both are faithful readings; unwrap one-field
            # structs on BOTH sides so the VALUES are what's compared.
            return _norm(next(iter(v.values())))
        # str keys: Spark surfaces int map keys as Python ints, the
        # rebuilt DuckDB maps as strings -- unify before sort_keys.
        return {str(k): _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float):
        return repr(v)
    return v


def _canon(rows) -> list[str]:
    dumped = [json.dumps(_norm(list(r)), sort_keys=True) for r in rows]
    return sorted(dumped)


@pytest.mark.parametrize("fname", PARQUET_COMPAT)
def test_parquet_compat_file_agrees_with_duckdb(spark, fname):
    path = os.path.join(TD, fname)
    sdf = spark.read.parquet(path)
    spark_rows = [tuple(r.asDict(recursive=True).values())
                  for r in sdf.collect()]
    con = duckdb.connect()
    try:
        duck_rows = con.execute(
            f"SELECT * FROM read_parquet('{path}')").fetchall()
    finally:
        con.close()
    assert len(spark_rows) > 0, f"{fname}: empty file?"
    assert _canon(spark_rows) == _canon(duck_rows), fname


def _csv(spark, fname: str, **options):
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(os.path.join(TD, fname))


def test_csv_cars_header_inference(spark):
    df = _csv(spark, "cars.csv", header=True, inferSchema=True)
    rows = {(r["year"], r["make"]) for r in df.collect()}
    assert (2012, "Tesla") in rows and (1997, "Ford") in rows
    assert df.schema["year"].dataType.simpleString() == "int"


def test_csv_alternative_delimiter_and_quote(spark):
    df = _csv(spark, "cars-alternative.csv", header=True, sep="|", quote="'")
    rows = {(r["year"], r["make"]) for r in df.collect()}
    assert ("2012", "Tesla") in rows and ("2015", "Chevy") in rows


def test_csv_malformed_rows_drop_and_capture(spark):
    schema = "year STRING, make STRING, model STRING, comment STRING, blank STRING"
    dropped = (spark.read.schema(schema)
               .option("header", True).option("comment", "~")
               .option("mode", "DROPMALFORMED")
               .csv(os.path.join(TD, "cars-malformed.csv")))
    # every data row carries extra tokens (the Chevy row a trailing
    # sixth empty field) -> all dropped on materialization.  count()
    # still says 3: it prunes every column, and with no fields parsed
    # malformedness cannot be detected -- the reference documents this
    # DROPMALFORMED count-vs-collect asymmetry (SPARK-21610) and we
    # pin both sides of it.
    assert len(dropped.collect()) == 0
    assert dropped.count() == 3
    captured = (spark.read
                .schema(schema + ", _corrupt_record STRING")
                .option("header", True).option("comment", "~")
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_corrupt_record")
                .csv(os.path.join(TD, "cars-malformed.csv")))
    # Filtering on the corrupt column alone is disallowed
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) -- the
    # documented pattern is to materialize the parse first.
    rows = captured.collect()
    assert sum(r["_corrupt_record"] is not None for r in rows) == 3


def test_csv_unbalanced_quotes_failfast_raises(spark):
    df = (spark.read.schema("a STRING, b STRING, c STRING")
          .option("mode", "FAILFAST")
          .csv(os.path.join(TD, "cars-unbalanced-quotes.csv")))
    with pytest.raises((PySparkException, Py4JJavaError)):
        df.collect()


def test_csv_null_value_token(spark):
    df = _csv(spark, "cars-null.csv", header=True, nullValue="null")
    rows = df.collect()
    tesla = next(r for r in rows if r["make"] == "Tesla")
    assert tesla["comment"] is None
    assert any(r["year"] is None and r["make"] == "Chevy" for r in rows)


def test_csv_bool_parsing(spark):
    df = (spark.read.schema("bool BOOLEAN").option("header", True)
          .csv(os.path.join(TD, "bool.csv")))
    assert [r["bool"] for r in df.collect()] == [True, False, True]


def test_csv_timestamp_format(spark):
    df = (spark.read.schema("date TIMESTAMP").option("header", True)
          .option("timestampFormat", "dd/MM/yyyy HH:mm")
          .csv(os.path.join(TD, "dates.csv")))
    years = sorted(r["date"].year for r in df.collect() if r["date"])
    assert years == [2014, 2015, 2016]


def test_csv_comment_char(spark):
    df = (spark.read.option("comment", "~").option("inferSchema", True)
          .csv(os.path.join(TD, "comments.csv")))
    vals = sorted(r[0] for r in df.collect())
    assert vals == [1, 1, 6]


def test_csv_decimal_schema_with_comments(spark):
    df = (spark.read
          .schema("decimal DECIMAL(38,18), long LONG, double DOUBLE")
          .option("header", True).option("comment", "~")
          .csv(os.path.join(TD, "decimal.csv")))
    rows = df.collect()
    assert len(rows) == 3 and all(r["decimal"] is not None for r in rows)


def test_csv_iso_8859_1_charset_and_thorn_delimiter(spark):
    df = _csv(spark, "cars_iso-8859-1.csv", header=True,
              sep="þ", encoding="iso-8859-1")
    rows = {(r["year"], r["make"]) for r in df.collect()}
    assert ("2012", "Tesla") in rows


def test_csv_tab_separated(spark):
    df = _csv(spark, "cars.tsv", header=True, sep="\t")
    assert any(r["make"] == "Tesla" for r in df.collect())


def test_csv_empty_file(spark):
    df = spark.read.csv(os.path.join(TD, "empty.csv"))
    assert df.count() == 0
