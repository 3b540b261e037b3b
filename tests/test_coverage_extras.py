"""Behavioral tests for the last SURVEY.md section 2 rows that neither a
gate query nor an existing suite covers."""

from __future__ import annotations

from pyspark.sql import functions as F

from ushas_spark.io import load_table, register_views


def test_existence_join_planned(spark, sf_dir):
    """IN-subquery inside a disjunction -> ExistenceJoin (reference:
    joinTypes.scala:90; not directly expressible by users)."""
    register_views(spark, sf_dir)
    df = spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders) OR c_acctbal > 9999
        """
    )
    assert "ExistenceJoin" in df._jdf.queryExecution().optimizedPlan().toString()
    assert df.count() > 0


def test_collect_limit_plan(spark, sf_dir):
    """limit + collect -> CollectLimitExec single-pass (reference:
    execution/limit.scala:35)."""
    df = load_table(spark, sf_dir, "orders").limit(7)
    assert len(df.collect()) == 7
    assert "CollectLimit" in df._jdf.queryExecution().executedPlan().toString()


def test_input_file_name_and_partition_id(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "nation")
        .select(
            F.input_file_name().alias("f"), F.spark_partition_id().alias("p")
        )
        .distinct()
        .collect()
    )
    assert all(r.f.endswith("nation.parquet") for r in rows)
    assert all(r.p >= 0 for r in rows)


def test_streaming_file_sink(spark, sf_dir, tmp_path):
    """Exactly-once file sink with metadata log (reference:
    FileStreamSink + _spark_metadata)."""
    import os

    from ushas_spark.streaming import ops

    events = ops.read_events_stream(spark, sf_dir)
    out = str(tmp_path / "file_sink_out")
    ckpt = str(tmp_path / "file_sink_ckpt")
    q = (
        events.select("event_id", "user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert os.path.isdir(os.path.join(out, "_spark_metadata"))
    back = spark.read.parquet(out)
    assert back.count() == load_table(spark, sf_dir, "events").count()


def test_reflect_uuid_assert_golden(spark):
    """CallMethodViaReflection, uuid shape, assert_true/raise_error
    (reference: CallMethodViaReflection.scala, misc.scala)."""
    row = spark.sql(
        """
        SELECT reflect('java.lang.Math', 'max', 3, 9) AS mx,
               java_method('java.lang.String', 'valueOf', 42) AS sv,
               uuid() AS u,
               assert_true(1 < 2) AS ok
        """
    ).collect()[0]
    assert row.mx == "9"  # reflect always returns STRING
    assert row.sv == "42"
    import re

    assert re.fullmatch(r"[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}", row.u)
    assert row.ok is None  # assert_true returns NULL on success
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.sql("SELECT raise_error('boom')").collect()


def test_count_min_sketch_deterministic(spark, sf_dir):
    """Seeded CMS is reproducible within Spark run-to-run."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["agg_count_min_sketch"]
    a = q(spark, sf_dir).collect()[0].sketch_hex
    b = q(spark, sf_dir).collect()[0].sketch_hex
    assert a == b and len(a) > 100


def test_higher_moments_derivation(spark, sf_dir):
    """Skewness/kurtosis from the pinned power sums agree with Spark's
    own skewness()/kurtosis() to float tolerance (the derivation is the
    portable path; Spark's is the convenience path)."""
    import math

    import __spark_entry__ as entrymod

    rows = {
        r.l_returnflag: r
        for r in entrymod.queries()["agg_higher_moments"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    ref = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.skewness("l_quantity").alias("sk"),
            F.kurtosis("l_quantity").alias("ku"),
        )
        .collect()
    }
    for flag, r in rows.items():
        n, s1, s2, s3 = r.n, r.s1, r.s2, r.s3
        s4 = r.s4
        mean = s1 / n
        m2 = s2 / n - mean**2
        m3 = s3 / n - 3 * mean * s2 / n + 2 * mean**3
        m4 = (
            s4 / n
            - 4 * mean * s3 / n
            + 6 * mean**2 * s2 / n
            - 3 * mean**4
        )
        skew = m3 / math.sqrt(m2) ** 3
        kurt = m4 / m2**2 - 3.0
        assert abs(skew - ref[flag].sk) < 1e-6
        assert abs(kurt - ref[flag].ku) < 1e-6


from pyspark.sql.types import (
    DoubleType,
    StructField,
    StructType,
    UserDefinedType,
)


class PointUDT(UserDefinedType):
    """Python UDT contract (module-level: the deserialiser imports the
    class by module + name, so a function-local UDT cannot round-trip)."""

    @classmethod
    def sqlType(cls):
        return StructType(
            [
                StructField("x", DoubleType(), False),
                StructField("y", DoubleType(), False),
            ]
        )

    @classmethod
    def module(cls):
        return cls.__module__

    def serialize(self, obj):
        return (obj.x, obj.y)

    def deserialize(self, datum):
        return Point(datum[0], datum[1])


class Point:
    __UDT__ = PointUDT()

    def __init__(self, x, y):
        self.x, self.y = x, y

    def __eq__(self, other):
        return (
            isinstance(other, Point)
            and self.x == other.x
            and self.y == other.y
        )


def test_python_user_defined_type_roundtrip(spark, tmp_path):
    """UserDefinedType via the Python UDT contract (SURVEY §1 type table;
    reference types/UserDefinedType.scala:42 + UDTRegistration): a 2-D
    point serialised as struct<x:double,y:double> must survive
    createDataFrame -> parquet round-trip -> deserialisation back to
    Python objects."""
    schema = StructType(
        [
            StructField("id", DoubleType(), False),
            StructField("p", PointUDT(), False),
        ]
    )
    # Arrow transfer does not support UDT columns (documented PySpark
    # limitation); the UDT contract runs on the pickle path.
    prev = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        df = spark.createDataFrame(
            [(float(i), Point(float(i), float(-i))) for i in range(10)],
            schema,
        )
        # The UDT column itself is opaque to field extraction (by design
        # -- reference UserDefinedType.scala keeps the object type
        # abstract); filters on sibling columns and full-row ops work.
        assert df.where("id < 5").count() == 5
        path = str(tmp_path / "points.parquet")
        df.write.mode("overwrite").parquet(path)
        back = (
            spark.read.schema(schema).parquet(path).orderBy("id").collect()
        )
        assert back[3].p == Point(3.0, -3.0)
        assert isinstance(back[0].p, Point)
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", prev)
