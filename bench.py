#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "replay_events": N, "replay_events_per_sec": X, "cpus": C}

Headline queries run against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; the CDC replay benchmark
generates a deterministic WAL sized to the scale factor (2M events at sf0.1)
and replays it through the engine — generation is untimed (it's input),
replay is the metric. CDC_WRITE_MODE=mor benches the merge-on-read mode.
``python BENCH/run_scaling.py`` runs this at two parallelism levels and
writes BENCH/BASELINE.md with scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from observability_platform___databricks_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "cdc_lww_latest",
    "cdc_hourly_rollup",
    "cdc_prev_event_gap",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_theta_overpriced",
    "topn_per_group",
    "exact_percentiles",
    "doc_exact_dedup",
    "doc_minhash_lsh",
    "doc_simhash_neardup",
    "doc_quality",
    "emb_cosine_topk",
    "emb_neardup_pairs",
    "emb_lsh_topk_batch",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    extra = {}
    if os.path.isdir("/dev/shm"):
        # shuffle on tmpfs: the sandbox's single virtio disk serializes
        # concurrent shuffle writers; a cluster's disk bandwidth scales
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        app_name="cdc-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    # python-worker warmup: the first pandas-UDF action pays ~5-7s of worker
    # spawn + pandas import across all cores; pay it before the clock starts
    from observability_platform___databricks_etl_pipeline_spark.functions.sanitize import sanitize_udf

    spark.range(CPUS * 4).selectExpr("cast(id as string) s").repartition(CPUS).select(
        sanitize_udf("s")
    ).collect()

    from observability_platform___databricks_etl_pipeline_spark.queries import QUERIES

    # Per-query MEDIAN over N trials (round-2 verdict: single trials made a
    # +20-40% drift on pure-JVM queries unfalsifiable against ±10-25%
    # noisy-neighbor session noise). Trial 1 of each query additionally pays
    # its codegen/broadcast warmup, which the median discounts.
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    per_trial: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(trials):
        for name in HEADLINE:
            t0 = time.perf_counter()
            _materialize(QUERIES[name](spark, SF_DIR))
            per_trial[name].append(time.perf_counter() - t0)
    timings: dict[str, float] = {
        name: round(statistics.median(ts), 3) for name, ts in per_trial.items()
    }

    # --- CDC replay throughput (the BASELINE.json metric) -----------------
    from observability_platform___databricks_etl_pipeline_spark.gen.changelog import (
        generate_changelog,
        write_wal,
    )
    from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine

    n_events = max(100_000, int(20_000_000 * sf))  # sf0.1 → 2M events
    chunk = max(100_000, n_events // 2)
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="cdc-bench-", dir=tmp_root)
    try:
        wal = f"{base}/wal"
        # updates-heavy key distribution (~500k keys at 2M events) — the
        # realistic CDC shape: change streams revisit keys
        write_wal(generate_changelog(spark, n_events, n_repos=50, n_paths=500), wal, chunk_size=chunk)
        # The replay is TRIALED like the queries (r3 verdict #1: the one
        # single-trial number left in the harness shipped a 2.3x phantom
        # regression that a clean re-run disproved). Median of 3 is the
        # headline (r4 ADVICE: the 2-trial default made the lower-median a
        # best-of-2, systematically flattering the trend line); per-trial
        # seconds and the median trial's per-phase breakdown go into the
        # JSON so an outlier self-attributes instead of whipsawing the
        # gate. Each trial replays into a FRESH table (same WAL).
        replay_trials = int(os.environ.get("SPARK_GRAFT_REPLAY_TRIALS", "3"))
        trial_secs: list[float] = []
        trial_phases: list[dict[str, float]] = []
        for t in range(replay_trials):
            tbl = f"{base}/tbl{t}"
            # rollup ON since round 2: an async content-pruned re-read of
            # the just-written bucket files, overlapped with the next batch
            # (2-5% over rollup-off at 2M/local[32]), not a merge re-run
            eng = CDCEngine(spark, tbl, n_buckets=32, with_rollup=True)
            t0 = time.perf_counter()
            res = eng.replay(wal)
            trial_secs.append(time.perf_counter() - t0)
            trial_phases.append({k: round(v, 3) for k, v in eng.phase_seconds.items()})
            if t < replay_trials - 1:  # keep the last table for scan_changes
                shutil.rmtree(tbl, ignore_errors=True)
        # incremental snapshot-diff read (r5): the downstream-consumer
        # primitive, timed on the last trial's table between the mid-replay
        # snapshot and HEAD — cost is O(buckets touched since A), manifest
        # metadata only, never a WAL re-read
        ids = eng.vault.snapshot_ids()
        mid_snap = ids[len(ids) // 2]
        ch_secs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(eng.changes(mid_snap))
            ch_secs.append(time.perf_counter() - t0)
        timings["cdc_scan_changes"] = round(statistics.median(ch_secs), 3)
        # lower median by total (index (n-1)//2: the true median for odd n;
        # trial 1 pays the codegen/python-worker warmup, which the median
        # discounts), keeping that trial's phase attribution attached; the
        # full spread is in replay_trial_sec
        mid = sorted(range(replay_trials), key=lambda i: trial_secs[i])[(replay_trials - 1) // 2]
        replay_s = trial_secs[mid]
        timings["cdc_replay"] = round(replay_s, 3)
        eps = n_events / replay_s
        applied = [b for b in res.batches if not b.skipped and b.logical_bytes]
        write_amp = round(
            sum(b.bytes_written for b in applied) / max(sum(b.logical_bytes for b in applied), 1),
            3,
        )
        merge_strategy = eng.merge_strategy
        write_mode = eng.write_mode
    finally:
        shutil.rmtree(base, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline queries + CDC replay wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "replay_events": n_events,
                "replay_events_per_sec": round(eps, 1),
                "replay_write_amplification": write_amp,
                "replay_merge_strategy": merge_strategy,
                "replay_write_mode": write_mode,
                "replay_trial_sec": [round(s, 3) for s in trial_secs],
                "replay_phase_sec": trial_phases[mid],
                "trials": trials,
                "query_min_sec": {
                    name: round(min(ts), 3) for name, ts in per_trial.items()
                },
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
