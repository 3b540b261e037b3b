"""File-format round-trips (SURVEY.md section 2.1 reader/writer surface).

Reference: DataFrameReader.scala:232-487 / DataFrameWriter.scala:59-226
(modes, partitionBy) and the per-format scans (ParquetFileFormat:56,
CSVFileFormat:38, JsonFileFormat:36, OrcFileFormat:80, TextFileFormat:39).
Round-trips run through scratch dirs; queries() entries must not write,
so this coverage lives here.
"""

from __future__ import annotations


import pytest

# r13 (VERDICT r12 item 2): execution-conformance twins run in the
# slow lane; the driver's default pytest invocation deselects them
# (opt in with USHAS_RUN_SLOW=1 -- the builder's round-close run).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from ushas_spark.io import load_table


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def _nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_formats(spark, sf_dir, scratch, fmt):
    df = _nation(spark, sf_dir)
    path = f"{scratch}/nation_{fmt}"
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)

    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").schema(df.schema)
    if fmt == "json":
        reader = reader.schema(df.schema)
    back = reader.load(path)
    assert sorted(back.collect()) == sorted(df.collect())


def test_text_format(spark, sf_dir, scratch):
    df = _nation(spark, sf_dir).select(F.col("n_name").alias("value"))
    path = f"{scratch}/nation_text"
    df.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    assert sorted(r.value for r in back.collect()) == sorted(
        r.value for r in df.collect()
    )


def test_write_modes(spark, sf_dir, scratch):
    """append / overwrite / ignore / errorifexists (reference:
    DataFrameWriter.scala:59 mode)."""
    df = _nation(spark, sf_dir)
    path = f"{scratch}/modes"
    df.write.mode("overwrite").parquet(path)
    df.write.mode("append").parquet(path)
    assert spark.read.parquet(path).count() == 2 * df.count()
    df.write.mode("overwrite").parquet(path)
    assert spark.read.parquet(path).count() == df.count()
    df.write.mode("ignore").parquet(path)  # no-op
    assert spark.read.parquet(path).count() == df.count()
    with pytest.raises(Exception):
        df.write.mode("errorifexists").parquet(path)


def test_partitioned_write_prunes(spark, sf_dir, scratch):
    """partitionBy layout + partition pruning on read (reference:
    PruneFileSourcePartitions.scala:26). The physical scan of a filtered
    read must only list the matching partition directory."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = f"{scratch}/orders_by_status"
    o.write.mode("overwrite").partitionBy("status").parquet(path)

    read = spark.read.parquet(path).filter(F.col("status") == "O")
    expected = o.filter(F.col("o_orderstatus") == "O").count()
    assert read.count() == expected
    plan = read._jdf.queryExecution().executedPlan().toString()
    # Partition filter must appear in the scan, not as a post-filter.
    assert "PartitionFilters: [isnotnull(status" in plan, plan[:2000]


def test_csv_permissive_vs_failfast(spark, scratch):
    """CSV parse modes (reference: CSVFileFormat permissive/failfast)."""
    bad = f"{scratch}/bad.csv"
    with open(bad, "w") as f:
        f.write("k,v\n1,a\nnot-an-int,b\n2,c\n")
    schema = "k INT, v STRING"
    perm = spark.read.schema(schema).option("header", "true").csv(bad)
    rows = perm.collect()
    assert len(rows) == 3  # permissive keeps the bad row with k=NULL
    assert sum(1 for r in rows if r.k is None) == 1
    ff = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(bad)
    )
    with pytest.raises(Exception):
        ff.collect()


def test_json_lines_and_multiline(spark, scratch):
    path = f"{scratch}/data.jsonl"
    with open(path, "w") as f:
        f.write('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    df = spark.read.schema("k BIGINT, v STRING").json(path)
    assert sorted((r.k, r.v) for r in df.collect()) == [(1, "a"), (2, "b")]

    mpath = f"{scratch}/multi.json"
    with open(mpath, "w") as f:
        f.write('[{"k": 1, "v": "a"},\n {"k": 2, "v": "b"}]')
    mdf = (
        spark.read.schema("k BIGINT, v STRING")
        .option("multiLine", "true")
        .json(mpath)
    )
    assert mdf.count() == 2


def test_bucketed_table_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """bucketBy co-located join (reference: DataFrameWriter.scala:201
    bucketBy+sortBy): joining two tables bucketed on the same key must
    plan no Exchange on either side -- the 100TB co-location strategy."""
    import uuid

    # saveAsTable("overwrite") still refuses a pre-existing managed-table
    # LOCATION (LOCATION_ALREADY_EXISTS) -- unique names keep runs clean;
    # the warehouse dir itself is a static conf fixed at session start.
    suffix = uuid.uuid4().hex[:8]
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        f"b_orders_{suffix}"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        f"b_lineitem_{suffix}"
    )
    # At test scale the planner prefers broadcast (which would hide the
    # bucketing); disable it to observe the co-located sort-merge join --
    # the shape that matters at 100TB where neither side broadcasts.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"b_orders_{suffix}").join(
            spark.table(f"b_lineitem_{suffix}"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:3000]
        assert "Bucketed: true" in plan, plan[:3000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_catalog_ddl_create_insert_drop(spark, sf_dir, tmp_path):
    """SQL DDL surface against the in-memory catalog with datasource
    tables: CREATE TABLE USING parquet, INSERT INTO, INSERT OVERWRITE,
    CTAS, SHOW/DESCRIBE, DROP (reference: sql/hive DDL suites; here on
    the session catalog, which is the supported surface in this
    container -- no Hive metastore)."""
    loc = (tmp_path / "ddl_tbl").as_posix()
    spark.sql("DROP TABLE IF EXISTS ddl_nation")
    spark.sql(
        f"CREATE TABLE ddl_nation (n_nationkey BIGINT, n_name STRING) "
        f"USING parquet LOCATION '{loc}'"
    )
    spark.sql("INSERT INTO ddl_nation VALUES (1, 'A'), (2, 'B')")
    spark.sql("INSERT INTO ddl_nation VALUES (3, 'C')")
    assert spark.table("ddl_nation").count() == 3
    spark.sql("INSERT OVERWRITE ddl_nation VALUES (9, 'Z')")
    assert [r.n_name for r in spark.table("ddl_nation").collect()] == ["Z"]
    assert any(
        t.name == "ddl_nation" for t in spark.catalog.listTables()
    )
    cols = {c.name for c in spark.catalog.listColumns("ddl_nation")}
    assert cols == {"n_nationkey", "n_name"}
    # CTAS from a real table
    spark.sql("DROP TABLE IF EXISTS ddl_ctas")
    ctas_loc = (tmp_path / "ddl_ctas").as_posix()
    spark.sql(
        f"CREATE TABLE ddl_ctas USING parquet LOCATION '{ctas_loc}' AS "
        f"SELECT * FROM parquet.`{sf_dir}/nation.parquet`"
    )
    assert spark.table("ddl_ctas").count() == 25
    spark.sql("DROP TABLE ddl_nation")
    spark.sql("DROP TABLE ddl_ctas")
    assert not any(
        t.name in ("ddl_nation", "ddl_ctas") for t in spark.catalog.listTables()
    )


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """Native XML source/sink (Spark 4.0+; upgrade over the reference,
    which only had xpath_* expressions over strings). Row-tag framed
    write then schema-inferred read must round-trip values."""
    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_xml")
    n.write.format("xml").option("rowTag", "nation").mode("overwrite").save(path)
    back = spark.read.format("xml").option("rowTag", "nation").load(path)
    assert sorted(back.columns) == sorted(n.columns)
    a = {tuple(r) for r in n.select("n_nationkey", "n_name").collect()}
    b = {tuple(r) for r in back.select("n_nationkey", "n_name").collect()}
    assert a == b


def test_observation_metrics(spark, sf_dir):
    """df.observe(Observation, ...) -- executor-side accumulated metrics
    piggybacking on a normal action (the CollectMetrics operator); the
    zero-extra-pass way to audit row counts / invariants inline at 100 TB."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("n_bad"),
    )
    total = observed.count()
    assert obs.get["n_rows"] == total
    assert obs.get["n_bad"] == 0


def test_jdbc_partitioned_read_and_pushdown(spark, sf_dir, tmp_path):
    """JDBC source: partitioned parallel read (partitionColumn bounds ->
    numPartitions JDBC slices) and predicate pushdown into the
    JDBCRelation scan (PushedFilters in the plan)."""
    from ushas_spark.io import load_table

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    cust.write.jdbc(url, "customer_t", mode="overwrite", properties=props)

    part = spark.read.jdbc(
        url,
        "customer_t",
        column="c_custkey",
        lowerBound=0,
        upperBound=cust.count() + 1,
        numPartitions=4,
        properties=props,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == cust.count()

    filtered = part.filter(F.col("c_nationkey") == 3)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_nationkey" in plan
    expected = cust.filter(F.col("c_nationkey") == 3).count()
    assert filtered.count() == expected


def test_hive_metastore_scan_and_dynamic_partition_insert(tmp_path):
    """Real Hive metastore coverage (reference: sql/hive/.../
    HiveTableScanExec.scala:53, InsertIntoHiveTable.scala:66): an
    embedded-Derby metastore + `USING hive` table, exercising CREATE /
    static INSERT / dynamic-partition INSERT OVERWRITE / scan. Runs in a
    subprocess because spark.sql.catalogImplementation is a static conf
    -- the suite's shared JVM already holds a non-Hive session."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession
        d = {str(tmp_path)!r}
        spark = (SparkSession.builder.master("local[2]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.warehouse.dir", d + "/wh")
            .config("spark.hadoop.javax.jdo.option.ConnectionURL",
                    "jdbc:derby:;databaseName=" + d + "/metastore_db;create=true")
            .config("spark.sql.session.timeZone", "UTC")
            .enableHiveSupport().getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        spark.sql("CREATE TABLE ht (k INT, v STRING) USING hive")
        spark.sql("INSERT INTO ht VALUES (1, 'a'), (2, 'b')")
        assert [tuple(r) for r in
                spark.sql("SELECT * FROM ht ORDER BY k").collect()] == \\
            [(1, 'a'), (2, 'b')]
        # dynamic-partition insert (nonstrict = all partitions dynamic)
        spark.sql("SET hive.exec.dynamic.partition.mode=nonstrict")
        spark.sql(
            "CREATE TABLE hp (v STRING) USING hive PARTITIONED BY (p INT)")
        spark.sql(
            "INSERT OVERWRITE TABLE hp PARTITION (p) "
            "SELECT v, k AS p FROM ht")
        parts = [r[0] for r in spark.sql("SHOW PARTITIONS hp").collect()]
        assert sorted(parts) == ['p=1', 'p=2'], parts
        # overwrite only the partitions present in the new data
        spark.sql(
            "INSERT OVERWRITE TABLE hp PARTITION (p) "
            "SELECT 'z' AS v, 1 AS p")
        rows = sorted(tuple(r) for r in spark.sql("SELECT v, p FROM hp").collect())
        assert rows == [('b', 2), ('z', 1)], rows
        plan = spark.sql("SELECT v FROM hp WHERE p = 2")._jdf \\
            .queryExecution().executedPlan().toString()
        assert "Scan hive" in plan or "HiveTableRelation" in plan, plan
        # Hive UDF bridge (reference: sql/hive/.../hiveUDFs.scala:43,124):
        # register a GenericUDF class from hive-exec and call it from SQL.
        spark.sql(
            "CREATE TEMPORARY FUNCTION hive_abs AS "
            "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFAbs'")
        assert spark.sql("SELECT hive_abs(-3) AS a").collect()[0][0] == 3
        # Hive UDAF bridge (hiveUDFs.scala:307): percentile is a classic
        # Hive-only UDAF class.
        spark.sql(
            "CREATE TEMPORARY FUNCTION hive_percentile AS "
            "'org.apache.hadoop.hive.ql.udf.UDAFPercentile'")
        got = spark.sql(
            "SELECT hive_percentile(CAST(k AS BIGINT), 0.5) FROM ht"
        ).collect()[0][0]
        assert abs(got - 1.5) < 1e-9, got
        print("HIVE_OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "HIVE_OK" in proc.stdout, proc.stdout + proc.stderr


def test_python_datasource_streaming_read(spark):
    """The Spark 4 Python Data Source STREAMING path: the synthetic
    source serves deterministic micro-batches; a drained stream must
    equal the batch read of the same row space."""
    from ushas_spark import datasource

    datasource.register(spark)
    stream = (
        spark.readStream.format("ushas_synthetic")
        .option("rows", "100")
        .option("batchRows", "37")
        .load()
    )
    agg = stream.groupBy("bucket").count()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_pyds_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.bucket, r["count"])
        for r in spark.table("t_pyds_stream").collect()
    }
    batch = (
        spark.read.format("ushas_synthetic").option("rows", "100").load()
    )
    expected = {
        (r.bucket, r["count"])
        for r in batch.groupBy("bucket").count().collect()
    }
    assert got == expected and got


def test_parquet_schema_evolution_merge_schema(spark, sf_dir, tmp_path):
    """Schema evolution across parquet files (the reference's
    ParquetFileFormat mergeSchema path): an old file without a column
    and a new file with it must union into one schema with NULLs
    backfilled -- the shape every long-lived dataset hits when a field
    is added mid-history."""
    path = str(tmp_path / "evolving")
    o = load_table(spark, sf_dir, "orders").limit(100)
    o.select("o_orderkey", "o_totalprice").write.parquet(f"{path}/v1")
    o.select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).write.parquet(f"{path}/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/v1", f"{path}/v2"
    )
    assert set(merged.columns) == {
        "o_orderkey", "o_totalprice", "o_orderstatus"
    }
    assert merged.count() == 200
    # Old-file rows surface the new column as NULL.
    assert merged.filter(F.col("o_orderstatus").isNull()).count() == 100
    # Without mergeSchema the picked footer may lack the new column --
    # the gotcha mergeSchema exists to fix (read must still succeed).
    plain = spark.read.parquet(f"{path}/v1", f"{path}/v2")
    assert plain.count() == 200


def test_python_datasource_write_path(spark, tmp_path):
    """Python Data Source WRITE support (the reference's DSv2
    WriteSupport/WriterCommitMessage protocol, sources/v2/writer/
    DataSourceWriter.java): per-task writers spill their partition,
    the driver-side commit aggregates task messages, and the committed
    manifest must account exactly for the written rows."""
    import json
    import os

    from ushas_spark.datasource import register_sink

    register_sink(spark)
    df = spark.range(0, 1000, numPartitions=4).selectExpr(
        "id AS k", "id * 7 AS v"
    )
    out = str(tmp_path / "sink_out")
    os.makedirs(out, exist_ok=True)
    df.write.format("ushas_sink").option("path", out).mode("append").save()
    with open(os.path.join(out, "_SUCCESS.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)
    assert manifest["n_rows"] == 1000
    assert manifest["n_tasks"] == 4
    spilled = 0
    for f in os.listdir(out):
        if f.startswith("part-"):
            with open(os.path.join(out, f), encoding="utf-8") as fh:
                spilled += len(json.load(fh))
    assert spilled == 1000


def test_max_partition_bytes_splits_scan(spark, tmp_path):
    """spark.sql.files.maxPartitionBytes actually governs scan
    parallelism (the partition-sizing lever the 100 TB notes lean on):
    one multi-megabyte parquet file must split into many input
    partitions when the cap shrinks, and collapse to few when it
    grows. Row-group sizing is forced small so the file is splittable."""
    path = str(tmp_path / "wide.parquet")
    (
        spark.range(0, 400_000)
        .selectExpr("id", "repeat(uuid(), 4) AS pad")
        .coalesce(1)
        .write.option("parquet.block.size", 262144)
        .mode("overwrite")
        .parquet(path)
    )
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
        small = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(1024 * 1024 * 1024)
        )
        large = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert small >= 8, f"1MB cap produced only {small} partitions"
    # With a large cap the planner still fans out to keep cores busy
    # (spark.sql.files.minPartitionNum defaults to the parallelism), so
    # assert the CAP effect, not an absolute floor.
    assert small > large, f"cap had no effect: {small} vs {large}"
