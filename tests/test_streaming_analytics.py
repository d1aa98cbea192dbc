"""Streaming analytics: watermarked windowed rollup + stateful sessionization.

Covers the three semantics that distinguish streaming from batch: exact
emit-once append output, late-data dropping at the watermark, and correct
session assembly when a user's events arrive out of order across
micro-batches (within the watermark)."""

import datetime as dt
import os
import shutil

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.streaming.analytics import (
    EVENTS_SCHEMA,
    SENTINEL_TYPE,
    SENTINEL_USER,
    sessionize_stream,
    stage_ordered_events,
    windowed_rollup_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(i, minutes, user, etype="click", value=1.0, seconds=0.0):
    return (i, T0 + dt.timedelta(minutes=minutes, seconds=seconds), user, etype, value, None)


def _write_file(spark, rows, path, mtime):
    tmp = path + ".tmp"
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), path)
    os.utime(path, (mtime, mtime))
    shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_rollup_stream_matches_batch(spark, tmp_path):
    rows = [_ev(i, minutes=i * 3 % 120, user=i % 5, etype=["click", "view"][i % 2], value=i * 0.5) for i in range(200)]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    stage, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    stage_ordered_events(spark, df, stage)
    windowed_rollup_stream(spark, stage, out, cp)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value_fp"])
        for r in spark.read.parquet(out).where(F.col("event_type") != SENTINEL_TYPE).collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["sum_value_fp"])
        for r in df.groupBy(
            F.window("ts", "10 minutes").start.alias("ws"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 10000)).alias("sum_value_fp"),
        )
        .collect()
    }
    assert got == want and len(got) > 10


def test_windowed_rollup_late_row_cannot_mutate_emitted_window(spark, tmp_path):
    """Watermark guarantee (Spark's actual contract): once the watermark
    passes a window and append mode emits it, a later row for that window
    can never be MERGED into the emitted result. (Dropping beyond-watermark
    rows outright is best-effort, not guaranteed — a late row may re-create
    fresh state and re-emit separately; it must never change the finalized
    aggregate.)"""
    stage, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(stage)
    # file 1: window [0,10) gets 2 on-time rows; a row at minute 120 drives
    # the watermark to 90 min, finalizing + emitting that window
    on_time = [_ev(i, minutes=m, user=1) for i, m in enumerate([0, 5, 120])]
    _write_file(spark, on_time, os.path.join(stage, "a.parquet"), 1_000_000_000)
    # spacer batch: state for [0,10) is evicted + emitted during THIS batch
    # (eviction uses the watermark computed from the previous batch)
    _write_file(spark, [_ev(50, minutes=125, user=1)], os.path.join(stage, "a2.parquet"), 1_000_000_030)
    # next file: a LATE row for the now-emitted [0,10) window
    _write_file(spark, [_ev(99, minutes=2, user=1)], os.path.join(stage, "b.parquet"), 1_000_000_060)
    # sentinels flush remaining state
    _write_file(spark, [(-1, T0 + dt.timedelta(days=100), SENTINEL_USER, SENTINEL_TYPE, 0.0, None)],
                os.path.join(stage, "s1.parquet"), 1_000_000_120)
    _write_file(spark, [(-2, T0 + dt.timedelta(days=200), SENTINEL_USER, SENTINEL_TYPE, 0.0, None)],
                os.path.join(stage, "s2.parquet"), 1_000_000_180)

    windowed_rollup_stream(spark, stage, out, cp, max_files_per_trigger=1)
    t0_counts = sorted(
        r["n"]
        for r in spark.read.parquet(out)
        .where((F.col("event_type") != SENTINEL_TYPE) & (F.col("window_start") == T0))
        .collect()
    )
    # the finalized n=2 emission exists and was never upgraded to n=3;
    # the late row either vanished or re-emitted alone (n=1)
    assert t0_counts in ([2], [1, 2])
    assert 3 not in t0_counts


def test_sessionize_stream_out_of_order_across_batches(spark, tmp_path):
    stage, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(stage)
    # user 1: one session [0, 10, 20] min — but the 10-min event arrives in a
    # LATER micro-batch (out of order, within the 2h watermark). A naive
    # per-batch lag() would split the session; the buffered sessionizer must
    # assemble exactly one. user 2: two sessions split by a 40-min gap.
    f1 = [_ev(1, 0, 1), _ev(3, 20, 1), _ev(10, 0, 2), _ev(11, 5, 2)]
    f2 = [_ev(2, 10, 1), _ev(12, 45, 2, value=7.0)]
    _write_file(spark, f1, os.path.join(stage, "a.parquet"), 1_000_000_000)
    _write_file(spark, f2, os.path.join(stage, "b.parquet"), 1_000_000_060)
    _write_file(spark, [(-1, T0 + dt.timedelta(days=100), SENTINEL_USER, SENTINEL_TYPE, 0.0, None)],
                os.path.join(stage, "s1.parquet"), 1_000_000_120)
    _write_file(spark, [(-2, T0 + dt.timedelta(days=200), SENTINEL_USER, SENTINEL_TYPE, 0.0, None)],
                os.path.join(stage, "s2.parquet"), 1_000_000_180)

    sessionize_stream(spark, stage, out, cp, max_files_per_trigger=1)
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value_fp"])
        for r in spark.read.parquet(out).where(F.col("user_id") != SENTINEL_USER).collect()
    )
    assert got == [
        (1, T0, T0 + dt.timedelta(minutes=20), 3, 30000),
        (2, T0, T0 + dt.timedelta(minutes=5), 2, 20000),
        (2, T0 + dt.timedelta(minutes=45), T0 + dt.timedelta(minutes=45), 1, 70000),
    ]


def test_sessionize_stream_matches_batch_on_events_table(spark, sf_dir, tmp_path):
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    stage_ordered_events(spark, ev, stage)
    sessionize_stream(spark, stage, out, cp)
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["sum_value_fp"])
        for r in spark.read.parquet(out).where(F.col("user_id") != SENTINEL_USER).collect()
    }

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("gap_s", F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        .withColumn(
            "sid",
            F.sum(F.when(F.col("gap_s").isNull() | (F.col("gap_s") > 1800), 1).otherwise(0)).over(w),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("end"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 10000)).alias("sv"),
        )
    )
    want = {(r["user_id"], r["start"]): (r["end"], r["n"], r["sv"]) for r in sess.collect()}
    assert got == want and len(got) > 1


def test_dedup_stream_suppresses_duplicates_across_batches(spark, tmp_path):
    from observability_platform___databricks_etl_pipeline_spark.streaming.analytics import dedup_stream

    stage, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    os.makedirs(stage)
    a, b2, c = _ev(1, 0, 1, value=5.0), _ev(2, 5, 1), _ev(3, 8, 2)
    _write_file(spark, [a, b2], os.path.join(stage, "a.parquet"), 1_000_000_000)
    # duplicate of event 1 arrives in a LATER micro-batch, within watermark
    _write_file(spark, [a, c], os.path.join(stage, "b.parquet"), 1_000_000_060)
    dedup_stream(spark, stage, out, cp, max_files_per_trigger=1)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_sessionize_tolerates_null_value_and_ts(spark, tmp_path):
    """One null-valued event must NOT kill the streaming query (math.floor
    of NaN previously raised in the worker): the event counts, contributes
    0 to the fixed-point sum; a null-ts event is dropped. Sentinel rows no
    longer appear in the raw output — the operator filters them itself."""
    from observability_platform___databricks_etl_pipeline_spark.streaming.analytics import (
        sessionize_stream,
    )

    rows = [
        _ev(1, minutes=0, user=7, value=2.0),
        _ev(2, minutes=5, user=7, value=None),          # null value: count, add 0
        (3, None, 7, "click", 1.0, None),               # null ts: dropped
        _ev(4, minutes=200, user=7, value=1.5),         # second session
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    stage, out, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    stage_ordered_events(spark, df, stage)
    sessionize_stream(spark, stage, out, cp, gap_s=1800)

    res = spark.read.parquet(out).orderBy("session_start").collect()
    assert [r["user_id"] for r in res] == [7, 7]        # no sentinel session in raw output
    assert [r["n_events"] for r in res] == [2, 1]
    assert [r["sum_value_fp"] for r in res] == [20000, 15000]


def test_stage_ordered_events_rejects_empty_input(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([], EVENTS_SCHEMA)
    with pytest.raises(ValueError, match="no non-null timestamps"):
        stage_ordered_events(spark, df, str(tmp_path / "in"))
