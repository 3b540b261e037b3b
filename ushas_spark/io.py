"""Table loading for the test star schema.

Mirrors the reference's reader surface (reference: sql/core/src/main/scala/
org/apache/spark/sql/DataFrameReader.scala:232-487) -- we use the stock
``spark.read`` API; Catalyst handles predicate pushdown / column pruning /
partition pruning on the parquet scans (reference equivalent:
execution/datasources/parquet/ParquetFileFormat.scala:56).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The driver-generated TPC-H-ish star schema plus LLM-pipeline tables
# (see /root/repo/TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor: region
# and nation are fixed-size (5 / 25 rows) regardless of SF.
BROADCAST_TABLES = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from the scale-factor directory.

    ``events.ts`` is parquet TIMESTAMP(NANOS). Depending on the Spark
    build it surfaces as either long nanos (when
    ``spark.sql.legacy.parquet.nanosAsLong`` is honoured) or as
    TIMESTAMP_NTZ (Spark 4 in this environment -- verified by probe).
    Normalize BOTH to a session-TZ TimestampType here so every consumer
    (unix_micros arithmetic, window/session ops, the streaming reader)
    sees one type. Under the pinned UTC session timezone the NTZ->TZ cast
    is value-exact; the ns->us truncation matches DuckDB's.
    """
    # Runtime-settable confs: hold even when the caller (e.g. the verify
    # driver) built the session without ushas_spark defaults. UTC keeps
    # timestamp formatting aligned with the DuckDB oracle regardless of
    # the host/session timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry point."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
