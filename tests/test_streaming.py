"""Streaming tests beyond the single-batch oracle replay: multi-batch
incremental processing, cross-batch dedup state, and stateful
sessionization agreement with the SQL formulation."""

from __future__ import annotations

import pytest
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
