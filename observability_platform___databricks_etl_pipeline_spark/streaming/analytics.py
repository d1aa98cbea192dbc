"""Streaming analytics over the events stream: watermarked windowed rollup
and stateful sessionization.

Reference analog: the always-on Event Hub pipeline
(``00_ingest_from_log_hub.py:89-117``) lands micro-batches that the hourly
job then aggregates (``03_build_flow_dataset.py:66-114``); here the same
rollup/sessionization runs *inside* Structured Streaming with event-time
watermarks, so late data is handled by the engine instead of by re-running
the hourly batch.

Both operators are deterministic under ``availableNow`` + ordered input
files, which lets the driver gate hash-verify STREAMING results against a
plain SQL oracle: a pair of far-future sentinel rows pushes the watermark
past every real event. The sessionizer filters its sentinel session itself
(nothing can push a predicate through the pandas stateful op); the rollup
and dedup sinks still CONTAIN sentinel rows — callers filter on
SENTINEL_TYPE/SENTINEL_USER — because a grouping-column filter inside the
operator gets pushed below the watermark node and stalls it, so append mode emits
exactly the complete, finalized result set.

Scale notes (100 TB): the windowed rollup is a standard watermarked
streaming aggregation — state is one row per (window, event_type), partial
aggregation happens map-side, and the watermark bounds state size. The
sessionizer buffers events per user only within the watermark horizon:
every invocation closes (emits + drops) all sessions that can no longer
change — a session ends more than ``gap_s`` before the watermark, so no
future row (all ≥ watermark) can extend or merge into it. State per user is
therefore O(events within the last watermark-delay + gap), not O(stream).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
SENTINEL_USER = -1
SENTINEL_TYPE = "__sentinel__"


def stage_ordered_events(
    spark: SparkSession,
    events: DataFrame,
    stage_dir: str,
    n_sentinels: int = 2,
) -> None:
    """Lay the events out as an ordered file sequence for FileStreamSource:
    real-event parquet parts first, then ``n_sentinels`` single-row sentinel
    files whose event time sits far past the real data. The sentinels push
    the watermark past every real event, so append mode emits the complete
    finalized result before the stream drains: in the default all-in-one
    trigger mode the final no-data micro-batch flushes state at
    wm = sentinel - delay; with ``max_files_per_trigger`` set,
    FileStreamSource processes files in modification-time order (mtimes
    here: data < sentinel-0 < sentinel-1) and the sentinel triggers flush
    progressively."""
    ev = events.select(
        F.col("event_id").cast("long"),
        F.col("ts").cast("timestamp"),
        F.col("user_id").cast("long"),
        F.col("event_type").cast("string"),
        F.col("value").cast("double"),
        F.col("props").cast("string"),
    )
    tmp = stage_dir + ".tmp"
    ev.write.mode("overwrite").parquet(tmp)
    os.makedirs(stage_dir, exist_ok=True)
    t0 = 1_000_000_000  # synthetic mtimes: data < sentinel1 < sentinel2
    i = 0
    for name in sorted(os.listdir(tmp)):
        if name.endswith(".parquet"):
            dst = os.path.join(stage_dir, f"data-{i:04d}.parquet")
            shutil.move(os.path.join(tmp, name), dst)
            os.utime(dst, (t0, t0))
            i += 1
    shutil.rmtree(tmp, ignore_errors=True)

    max_ts = ev.agg(F.max("ts")).first()[0]
    if max_ts is None:
        raise ValueError(
            "stage_ordered_events: events frame has no non-null timestamps — "
            "sentinels would carry null event time, the watermark would never "
            "advance, and the append-mode sink would emit nothing readable"
        )
    for s in range(n_sentinels):
        row = spark.createDataFrame(
            [(-(s + 1), SENTINEL_USER, SENTINEL_TYPE, 0.0, None)],
            "event_id long, user_id long, event_type string, value double, props string",
        ).select(  # column order must match EVENTS_SCHEMA
            "event_id",
            (F.lit(max_ts) + F.expr(f"INTERVAL {100 * (s + 1)} DAYS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        sdir = os.path.join(stage_dir + f".s{s}")
        row.coalesce(1).write.mode("overwrite").parquet(sdir)
        part = next(n for n in os.listdir(sdir) if n.endswith(".parquet"))
        dst = os.path.join(stage_dir, f"sentinel-{s}.parquet")
        shutil.move(os.path.join(sdir, part), dst)
        os.utime(dst, (t0 + 60 * (s + 1), t0 + 60 * (s + 1)))
        shutil.rmtree(sdir, ignore_errors=True)


def _read_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None
) -> DataFrame:
    """File stream over the staged dir. By default all available files land
    in the first trigger: parquet part files carry no event-time ordering,
    so feeding them one-per-trigger would advance the watermark past rows
    still sitting in later files and drop them as late — correct watermark
    behavior, wrong replay model. Tests that exercise late/out-of-order
    arrival pass ``max_files_per_trigger=1`` with explicitly ordered file
    mtimes."""
    src = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return src.parquet(events_dir)


def windowed_rollup_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """Watermarked tumbling-window rollup (streaming A1): append-mode
    windowed aggregation — a window is emitted exactly once, when the
    watermark passes its end. Whole plan is JVM-side (partial agg + state
    store); state is bounded by the watermark."""
    agg = (
        _read_stream(spark, events_dir, max_files_per_trigger)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # FIXED-POINT sum: floor(value·1e4) is an exact long per row
            # (IEEE double multiply + floor are engine-identical), and a sum
            # of longs is associative — so the result is independent of
            # partial-agg order, scan order, and engine, where a rounded
            # double sum can flip its last decimal under re-association
            # (round-2 ADVICE: the hash gate must not be float-order flaky).
            F.sum(F.floor(F.col("value") * 10000)).alias("sum_value_fp"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value_fp")
    )
    # NOTE: sentinel rows are NOT filtered here by design — a filter on the
    # grouping column is deterministic and Catalyst pushes it below the
    # EventTimeWatermark node, so the sentinels would never advance the
    # watermark and the tail windows would never be emitted (verified:
    # adding the where() here dropped the last 8 windows in the parity
    # test). Callers read the sink with event_type != SENTINEL_TYPE.
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Stateful streaming sessionization via ``applyInPandasWithState``
    (§2.9/§2.10: the custom-stateful-operator surface).

    Per user, buffer (ts_ns, value) pairs in group state; on every
    invocation sort the buffer, segment on ``gap_s``, and emit every session
    that ended more than ``gap_s`` before the current watermark — such a
    session is immutable (any future row has event time ≥ watermark, so it
    can neither extend nor merge it). The remaining open tail stays in
    state with an event-time timeout at (last buffered ts + gap), so the
    final sessions flush as soon as the watermark passes them, with no
    per-batch rescan. Buffering is exact under out-of-order arrival within
    the watermark — unlike a lag()-per-micro-batch approach, which closes
    sessions a late row could still have joined."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_type = (
        "user_id long, session_start timestamp, session_end timestamp,"
        " n_events long, sum_value_fp long"
    )
    state_type = "ts array<long>, val array<double>"
    gap_ns = int(gap_s) * 1_000_000_000

    def fn(key, pdf_iter, state: GroupState):
        ts: list[int] = []
        val: list[float] = []
        if state.exists:
            old_ts, old_val = state.get
            ts.extend(old_ts)
            val.extend(old_val)
        for pdf in pdf_iter:
            # null-safe: a null ts cannot be placed in time (drop the row,
            # matching what a watermarked agg would do); a null value counts
            # the event but contributes 0 to the sum — the same semantics as
            # F.count + F.sum in the windowed rollup. Without this, one null
            # value made math.floor(NaN) kill the whole streaming query.
            tcol = pdf["ts"].astype("datetime64[ns]")
            mask = tcol.notna()
            ts.extend(tcol[mask].astype("int64").tolist())
            val.extend(pdf["value"][mask].astype("float64").fillna(0.0).tolist())
        if not ts:
            state.remove()
            return
        order = sorted(range(len(ts)), key=ts.__getitem__)
        ts = [ts[i] for i in order]
        val = [val[i] for i in order]

        # segment on gap
        sessions: list[tuple[int, int]] = []  # [start_idx, end_idx] inclusive
        start = 0
        for i in range(1, len(ts)):
            if ts[i] - ts[i - 1] > gap_ns:
                sessions.append((start, i - 1))
                start = i
        sessions.append((start, len(ts) - 1))

        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        closed = [s for s in sessions if ts[s[1]] + gap_ns < wm_ns]
        kept = [s for s in sessions if ts[s[1]] + gap_ns >= wm_ns]

        if kept:
            lo, hi = kept[0][0], kept[-1][1]
            state.update((ts[lo : hi + 1], val[lo : hi + 1]))
            timeout_ms = max(
                (ts[hi] + gap_ns) // 1_000_000 + 1_000,
                state.getCurrentWatermarkMs() + 1_000,
            )
            state.setTimeoutTimestamp(timeout_ms)
        else:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(ts[a], unit="ns") for a, _ in closed],
                    "session_end": [pd.Timestamp(ts[b], unit="ns") for _, b in closed],
                    "n_events": [b - a + 1 for a, b in closed],
                    # fixed-point: floor(v·1e4) per row then integer sum —
                    # order-independent and exact, so the hash gate can't be
                    # flipped by float re-association (see windowed rollup)
                    "sum_value_fp": [
                        sum(int(math.floor(v * 10000)) for v in val[a : b + 1])
                        for a, b in closed
                    ],
                }
            )

    sessions = (
        _read_stream(spark, events_dir, max_files_per_trigger)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_type, state_type, "append", GroupStateTimeout.EventTimeTimeout
        )
        .where(F.col("user_id") != SENTINEL_USER)
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming exact deduplication: first occurrence of each key is
    emitted, replays/duplicates are suppressed by keyed state.
    ``dropDuplicatesWithinWatermark`` bounds state by event time — a key's
    dedup record is dropped once the watermark passes it, so state is
    O(keys per watermark horizon), not O(stream) (the scale requirement;
    plain dropDuplicates would grow forever). Duplicates that straddle more
    than the watermark delay are the accepted trade — same contract as the
    reference's dedup-on-ingest."""
    src = _read_stream(spark, events_dir, max_files_per_trigger).withWatermark("ts", watermark)
    q = (
        # sentinel filtering is the caller's job here too: the predicate
        # would push below the watermark node (same trap as the rollup) —
        # output rows would be unchanged, but the watermark would stop
        # advancing and dedup state would never be GC'd on a live stream
        src.dropDuplicatesWithinWatermark(list(key_cols))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
