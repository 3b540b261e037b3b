"""Streaming tests beyond the single-batch oracle replay: multi-batch
incremental processing, cross-batch dedup state, and stateful
sessionization agreement with the SQL formulation."""

from __future__ import annotations

import pytest

# r13 (VERDICT r12 item 2): execution-conformance twins run in the
# slow lane; the driver's default pytest invocation deselects them
# (opt in with USHAS_RUN_SLOW=1 -- the builder's round-close run).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.streaming import ops


@pytest.fixture()
def multi_batch_dir(spark, sf_dir, tmp_path):
    """events split into 4 files so maxFilesPerTrigger=1 yields 4
    genuine micro-batches."""
    out = str(tmp_path / "events_split")
    (
        load_table(spark, sf_dir, "events")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def _stream_from(spark, path):
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )


def test_multibatch_agg_equals_batch(spark, sf_dir, multi_batch_dir):
    """4 micro-batches of incremental stateful aggregation must converge
    to the batch answer (state restore/save across batches -- reference:
    statefulOperators.scala:223,277)."""
    stream = _stream_from(spark, multi_batch_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("event_type")
        .count()
    )
    got = {
        (r.event_type, r["count"])
        for r in ops.run_to_memory(agg, "mb_agg", output_mode="complete").collect()
    }
    expect = {
        (r.event_type, r["count"])
        for r in load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()
    }
    assert got == expect


def test_multibatch_dedup_emits_once(spark, sf_dir, multi_batch_dir):
    """Keys recurring across micro-batches are emitted exactly once
    (cross-batch dedup state -- StreamingDeduplicateExec)."""
    stream = _stream_from(spark, multi_batch_dir)
    out = ops.run_to_memory(
        stream.select("user_id", "event_type").dropDuplicates(),
        "mb_dedup",
        output_mode="append",
    )
    rows = out.collect()
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))
    expect = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert len(keys) == expect


def test_sessionize_state_matches_sql_sessionization(spark, sf_dir):
    """applyInPandasWithState sessions == lag/cumsum SQL sessions on the
    fully processed stream (start + count; state op end excludes gap)."""
    events = ops.read_events_stream(spark, sf_dir)
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in ops.run_to_memory(
            ops.sessionize_with_state(events), "ss_state2", output_mode="append"
        ).collect()
    }
    from pyspark.sql import Window as W

    batch = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    sessions = (
        batch.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800)
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("s_start"),
            F.count("*").alias("n"),
        )
    )
    expect = {(r.user_id, r.s_start, r.n) for r in sessions.collect()}
    assert got == expect


def test_watermark_in_plan(spark, sf_dir):
    """withWatermark plants EventTimeWatermark (reference:
    EventTimeWatermarkExec.scala:79)."""
    events = ops.read_events_stream(spark, sf_dir)
    plan = ops.tumbling_counts(events)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_streaming_lineage(spark, sf_dir):
    """Lineage over streaming plans: StreamingRelation leaves are
    attributed (SURVEY.md Phase D)."""
    from ushas_spark.lineage import lineage

    events = ops.read_events_stream(spark, sf_dir)
    agg = ops.tumbling_counts(events)
    edges = lineage(agg).edges(short_source=False)
    assert any(col == "sum_value" and "value" == src_col for col, _, src_col in edges)
    srcs = {s for _, s, _ in edges}
    assert srcs  # every leaf got some source identity


@pytest.mark.skipif(
    not ops.supports_transform_with_state(),
    reason="google.protobuf unavailable in this container "
    "(transformWithState state-server dependency)",
)
def test_transform_with_state_running_count(spark, sf_dir):
    """transformWithStateInPandas running count must agree with the batch
    groupBy count on a finite replay."""
    ev = ops.read_events_stream(spark, sf_dir)
    out = ops.run_to_memory(
        ops.running_count_with_state(ev), "t_tws", output_mode="update"
    )
    got = {(r.user_id, r.n_events) for r in out.collect()}
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").count()
    want = {(r.user_id, r["count"]) for r in batch.collect()}
    assert got == want


def test_streaming_limit_emits_exactly_n(spark, sf_dir, multi_batch_dir):
    """StreamingGlobalLimitExec: .limit(n) on an append stream emits
    exactly n rows across multiple micro-batches (state carries the
    running total; later batches top up, then stop)."""
    total = load_table(spark, sf_dir, "events").count()
    n = min(150, total - 1)
    limited = ops.streaming_limit(_stream_from(spark, multi_batch_dir), n)
    out = ops.run_to_memory(limited, "t_limit_test", output_mode="append")
    assert out.count() == n


def test_console_sink_smoke(spark, sf_dir):
    """Console sink (reference: execution/streaming/sources/
    ConsoleWriter.scala): the format('console') writer must plan and run
    a finite replay to completion."""
    events = ops.read_events_stream(spark, sf_dir)
    q = (
        events.groupBy("event_type")
        .count()
        .writeStream.outputMode("complete")
        .format("console")
        .option("numRows", "3")
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.lastProgress is not None
    finally:
        q.stop()


def test_socket_source_smoke(spark):
    """Socket source (reference: execution/streaming/sources/socket.scala):
    serve lines over a loopback socket, read with format('socket'), and
    check the lines arrive in a memory sink. Skips if the container
    forbids loopback listeners."""
    import socket
    import threading
    import time

    lines = [f"line-{i}" for i in range(20)]
    try:
        server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        server.bind(("127.0.0.1", 0))
        server.listen(1)
    except OSError as exc:  # pragma: no cover - environment-dependent
        pytest.skip(f"loopback listener unavailable: {exc}")
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(3)

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    stream = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", str(port))
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_socket_test")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("t_socket_test").count() >= len(lines):
                break
            time.sleep(0.5)
        got = {r.value for r in spark.table("t_socket_test").collect()}
        assert set(lines) <= got
    finally:
        q.stop()
        server.close()


def test_checkpoint_restart_resumes_without_reprocessing(
    spark, sf_dir, multi_batch_dir, tmp_path
):
    """Checkpoint/offset-log recovery (reference: execution/streaming/
    OffsetSeqLog.scala, state store restore): run a stateful streaming
    aggregation over the first half of the input, STOP the query, add
    the second half, restart with the SAME checkpoint, and require (a)
    the final counts equal the batch answer over everything, and (b) the
    restarted query's starting batch id follows the stopped one (the
    offset log was honoured, not restarted from zero)."""
    import shutil
    from pathlib import Path

    src = sorted(Path(multi_batch_dir).glob("part-*.parquet"))
    assert len(src) == 4
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    for f in src[:2]:
        shutil.copy(f, stream_dir / f.name)

    def start():
        stream = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )
        agg = stream.groupBy("event_type").count()
        return (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("ckpt_restart")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    q1.processAllAvailable()
    first_batch = q1.lastProgress["batchId"]
    q1.stop()

    for f in src[2:]:
        shutil.copy(f, stream_dir / f.name)
    q2 = start()
    q2.processAllAvailable()
    assert q2.lastProgress["batchId"] > first_batch >= 0
    q2.stop()

    got = {
        (r.event_type, r["count"])
        for r in spark.table("ckpt_restart").collect()
    }
    expect = {
        (r.event_type, r["count"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert got == expect


def test_rocksdb_state_store_provider(spark, sf_dir, tmp_path):
    """RocksDB state store (Spark 3.2+ upgrade over the reference's
    HDFS-backed store): run a stateful streaming aggregation with the
    RocksDB provider and verify the state operator actually used it
    (customMetrics expose rocksdb* counters) and results are correct."""
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = ops.read_events_stream(spark, sf_dir)
        q = (
            events.groupBy("event_type")
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_rocksdb")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            progress = q.lastProgress
        finally:
            q.stop()
        metrics = progress["stateOperators"][0]["customMetrics"]
        assert any(k.startswith("rocksdb") for k in metrics), metrics
        got = {
            (r.event_type, r["count"])
            for r in spark.table("t_rocksdb").collect()
        }
        expect = {
            (r.event_type, r["count"])
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .count()
            .collect()
        }
        assert got == expect
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)


def test_update_mode_emits_changed_keys_per_batch(spark, sf_dir, multi_batch_dir):
    """Update output mode (reference: InternalOutputModes.scala:34-48):
    each micro-batch emits the CHANGED aggregate rows only; the union of
    the last emission per key must equal the batch answer."""
    from pyspark.sql import Window as W

    stream = _stream_from(spark, multi_batch_dir)
    agg = stream.groupBy("event_type").count()
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_update_mode")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = q.lastProgress["batchId"] + 1
    finally:
        q.stop()
    emitted = spark.table("t_update_mode")
    # multiple emissions per key (one per batch that changed it) ...
    assert emitted.count() > emitted.select("event_type").distinct().count()
    assert n_batches == 4
    # ... and the LAST emission per key is the final count. The memory
    # sink has no batch column, but counts grow monotonically per key,
    # so max(count) per key IS the last emission.
    final = emitted.groupBy("event_type").agg(F.max("count").alias("count"))
    got = {(r.event_type, r["count"]) for r in final.collect()}
    expect = {
        (r.event_type, r["count"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert got == expect


def test_available_now_trigger_drains_and_stops(spark, sf_dir, multi_batch_dir):
    """Trigger.AvailableNow (Spark 3.3+): process everything available in
    rate-limited batches, then stop on its own -- the batch-job-over-
    streaming-source pattern (replaces Trigger.Once)."""
    stream = _stream_from(spark, multi_batch_dir)
    q = (
        stream.groupBy("user_id")
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_available_now")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive, "availableNow query must self-terminate"
    total = spark.table("t_available_now").agg(F.sum("count")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_drop_duplicates_within_watermark(spark, sf_dir, multi_batch_dir):
    """dropDuplicatesWithinWatermark (Spark 3.5+, beyond the reference):
    dedup state is EVICTED once the watermark passes, so state stays
    bounded on infinite streams -- the production replacement for plain
    streaming dropDuplicates when keys never stop arriving. On this
    finite replay with a generous watermark nothing is evicted early, so
    the result must equal the batch distinct."""
    stream = _stream_from(spark, multi_batch_dir)
    deduped = stream.withWatermark("ts", "10 days").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    out = ops.run_to_memory(deduped, "t_dedup_wm", output_mode="append")
    got = {(r.user_id, r.event_type) for r in out.select("user_id", "event_type").collect()}
    expect = {
        (r.user_id, r.event_type)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == expect


def test_stream_stream_left_outer_join(spark, sf_dir):
    """LEFT OUTER stream-stream join (StreamingSymmetricHashJoin with
    null emission on state eviction): matched rows must equal the batch
    inner join exactly; null-extended rows appear only for views whose
    join window closed before the final watermark (so they are a subset
    of the batch anti-join). The exact set of emitted nulls depends on
    watermark-advance timing, which is why this is a test with set
    inequalities rather than a value-hash gate."""
    events = ops.read_events_stream(spark, sf_dir)
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
        .withWatermark("v_ts", "10 minutes")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select("v_id", "p_id")
    out = ops.run_to_memory(joined, "t_ss_left", output_mode="append")
    got_matched = {(r.v_id, r.p_id) for r in out.collect() if r.p_id is not None}
    got_nulls = {r.v_id for r in out.collect() if r.p_id is None}

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    batch = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    want_matched = {(r.v_id, r.p_id) for r in batch.select("v_id", "p_id").collect()}
    matched_vids = {t[0] for t in want_matched}
    all_vids = {r.v_id for r in v.select("v_id").collect()}
    assert got_matched == want_matched
    assert got_nulls <= (all_vids - matched_vids)
    assert got_nulls, "no null-extended rows emitted at all"


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """The watermark actually DROPS late data (reference:
    EventTimeWatermarkExec + statefulOperators watermark predicates):
    batch 1 advances the watermark far past an old window; batch 2
    delivers an event older than the watermark; in append mode its
    window must never be emitted and the state operator must report
    the drop."""
    import pandas as pd

    path = tmp_path / "late_feed"
    path.mkdir()
    schema = "event_id bigint, ts timestamp, v bigint"

    def write_file(name, rows):
        pd.DataFrame(
            rows, columns=["event_id", "ts", "v"]
        ).astype({"ts": "datetime64[us]"}).to_parquet(path / name)

    # Batch 1: recent events -> max event time 2024-01-10, watermark
    # after the batch = 2024-01-10 minus 1h, far beyond 2024-01-01.
    write_file(
        "b1.parquet",
        [
            (1, pd.Timestamp("2024-01-10 10:00:00"), 1),
            (2, pd.Timestamp("2024-01-10 11:00:00"), 1),
        ],
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(path))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH").alias("w"), "n"
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_drop")
        .start()
    )
    try:
        q.processAllAvailable()
        # Batch 2: an event 9 days older than the watermark.
        write_file(
            "b2.parquet", [(3, pd.Timestamp("2024-01-01 00:30:00"), 1)]
        )
        q.processAllAvailable()
        # One more batch so closed windows flush to the append sink.
        write_file(
            "b3.parquet", [(4, pd.Timestamp("2024-01-10 13:00:00"), 1)]
        )
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p["stateOperators"]
        )
    finally:
        q.stop()
    emitted = {r.w for r in spark.table("t_late_drop").collect()}
    assert "2024-01-01 00" not in emitted
    assert dropped >= 1, f"watermark never dropped the late row: {dropped}"


def test_session_window_dynamic_gap(spark, sf_dir):
    """Dynamic-gap session windows (Spark 3.2+): the gap is an
    EXPRESSION evaluated per row, so different event types can close
    sessions at different speeds -- here 'view' rows extend a session
    by 1 hour but 'purchase' rows only by 5 minutes. Checked as batch
    semantics (session_window works identically in batch), with an
    explicit expectation: the same rows under a fixed 1-hour gap merge
    into FEWER sessions than under the dynamic gap."""
    from datetime import datetime

    rows = [
        # user 1: view 10:00 extends to 11:00; purchase 11:30 starts a
        # fresh session that (dynamic 5m gap) closes at 11:35, so the
        # 11:45 view is a THIRD session. A fixed 1-hour gap instead
        # chains purchase+view into one (2 sessions total) -- the gap
        # expression is what changes the sessionization.
        (1, datetime(2024, 1, 1, 10, 0, 0), "view"),
        (1, datetime(2024, 1, 1, 11, 30, 0), "purchase"),
        (1, datetime(2024, 1, 1, 11, 45, 0), "view"),
        # user 2: single row.
        (2, datetime(2024, 1, 1, 12, 0, 0), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP, event_type STRING")
    gap = F.when(F.col("event_type") == "purchase", F.lit("5 minutes")).otherwise(
        F.lit("1 hour")
    )
    dyn = (
        df.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    fixed = (
        df.groupBy(F.session_window("ts", "1 hour"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    dyn_u1 = sorted(r.n for r in dyn if r.user_id == 1)
    fixed_u1 = sorted(r.n for r in fixed if r.user_id == 1)
    assert dyn_u1 == [1, 1, 1], dyn
    assert fixed_u1 == [1, 2], fixed
    assert len([r for r in dyn if r.user_id == 2]) == 1
