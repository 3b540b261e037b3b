"""SparkSession construction with scale-conscious defaults.

The reference engine's session entry points are ``SparkSession.builder`` /
``sessionState`` (reference: sql/core/src/main/scala/org/apache/spark/sql/
SparkSession.scala). We wrap the stock builder and pin configs that matter
for both the local test harness (local[N], single JVM) and a real cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) --
  supersedes the reference's primitive ``ExchangeCoordinator``
  (reference: execution/exchange/ExchangeCoordinator.scala:85).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a 1000-executor
  cluster this should be ~2-3x total cores and AQE coalesces down.
- Session timezone pinned to UTC so timestamp semantics are stable and match
  the DuckDB oracle (naive/UTC timestamps).
- Arrow enabled for every Python<->JVM data path (pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ushas_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with ushas_spark defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. On a real
    cluster the caller passes master/resource configs via ``extra_conf``
    or spark-submit; everything here is master-agnostic except the
    local[] fallback.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    n_shuffle = shuffle_partitions or int(os.environ.get("USHAS_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle sizing: ~cores in local mode. AQE coalesces small outputs.
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Stable timestamp semantics; matches the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow everywhere Python touches data.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode = driver-only JVM; this is the one memory knob.
        .config("spark.driver.memory", os.environ.get("USHAS_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        # Parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark
        # natively; surface it as long nanos and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Keep managed tables (bucketing tests etc.) inside the repo.
        .config("spark.sql.warehouse.dir", os.environ.get(
            "USHAS_WAREHOUSE", "/root/repo/.spark-warehouse"))
        # Broadcast threshold: keep default 10MB; dimension tables in the
        # star schema are far below it, and we also hint explicitly.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
