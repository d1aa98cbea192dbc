"""Structured Streaming front-end for the CDC engine.

Reference analog: Event Hub ``readStream`` → ``writeStream`` with a
checkpoint dir (``00_ingest_from_log_hub.py:89-117``). Here a parquet file
stream tails the WAL directory and ``foreachBatch`` hands each micro-batch to
the same exactly-once MERGE path the batch replay uses — so a crash/restart
of the streaming query cannot double-apply (idempotent commit manifests make
Spark's at-least-once ``foreachBatch`` effectively exactly-once).

The batch loop (``CDCEngine.replay``) remains the primary entry point
(deterministic chunking → deterministic benchmarks); this wrapper exists to
prove the engine composes with always-on Structured Streaming.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine



def stream_replay(
    spark: SparkSession,
    wal_dir: str,
    engine: CDCEngine,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    keep_staged: int = 64,
) -> None:
    """Run the WAL through Structured Streaming into the COW table, draining
    all currently-available data synchronously (processAllAvailable).

    Each micro-batch is staged as parquet under the checkpoint dir so the
    engine's chunk path can consume it; ``keep_staged`` bounds that side
    state — after every applied batch, committed staged dirs beyond the
    newest ``keep_staged`` are removed (an always-on stream would otherwise
    accumulate a second full copy of the WAL until the volume filled).
    Retention mirrors ``CDCEngine.expire``: quarantined-row payloads older
    than the window are traded away; the exactly-once skip set is
    unaffected (batch ids live in the table's batch log, not here)."""

    from observability_platform___databricks_etl_pipeline_spark.sources.wal import chunked_schema

    stream = (
        spark.readStream.schema(chunked_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("basePath", wal_dir)
        .parquet(wal_dir)
    )

    def apply_batch(df: DataFrame, epoch_id: int) -> None:
        # batch identity from the EXACT file set of this micro-batch. A chunk
        # whose files span multiple micro-batches (files_per_chunk >
        # maxFilesPerTrigger — the normal WAL layout) must yield a distinct
        # bid per batch, or later batches hash to an already-committed id and
        # silently drop events. Not the epoch id either: that changes when the
        # checkpoint dir is wiped (a wipe downgrades to at-least-once, which
        # LWW-by-seq absorbs — same final state, metrics may double-count).
        files = sorted(
            r[0] for r in df.select(F.input_file_name()).distinct().collect()
        )
        bid = hashlib.sha256(
            ("|".join([os.path.abspath(wal_dir), "stream", *files])).encode()
        ).hexdigest()[:24]
        if bid in engine.vault.committed_batches():
            return
        staged = os.path.join(checkpoint_dir, f"staged-{bid}")
        df.drop("chunk").write.mode("overwrite").parquet(f"{staged}/chunk=0")
        engine._apply_chunk(staged, 0, bid)
        if keep_staged >= 0:
            committed = engine.vault.committed_batches()
            olds = sorted(
                (
                    os.path.join(checkpoint_dir, d)
                    for d in os.listdir(checkpoint_dir)
                    if d.startswith("staged-") and d[len("staged-") :] in committed
                ),
                key=os.path.getmtime,
            )
            for dead in olds[: max(0, len(olds) - keep_staged)]:
                shutil.rmtree(dead, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "sscp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
