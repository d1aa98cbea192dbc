"""Structured Streaming front-end drains the WAL into the same table state as
the batch replay (exactly-once via the shared manifest layer)."""

from observability_platform___databricks_etl_pipeline_spark.gen.changelog import generate_changelog, write_wal
from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine
from observability_platform___databricks_etl_pipeline_spark.streaming.stream import stream_replay


def test_stream_replay_matches_batch(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 3000, seed=5), wal, chunk_size=1000)

    batch_eng = CDCEngine(spark, str(tmp_path / "batch_tbl"), n_buckets=8)
    batch_eng.replay(wal)
    want = {
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in batch_eng.current_state().collect()
    }

    stream_eng = CDCEngine(spark, str(tmp_path / "stream_tbl"), n_buckets=8)
    stream_replay(spark, wal, stream_eng, str(tmp_path / "cp"), max_files_per_trigger=2)
    got = {
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in stream_eng.current_state().collect()
    }
    assert got == want and got

    # restart the stream with a WIPED spark checkpoint: manifest layer must
    # still make it a no-op (batch ids derive from WAL chunks, not epochs)
    sid = stream_eng.vault.current_snapshot_id()
    stream_replay(spark, wal, stream_eng, str(tmp_path / "cp2"), max_files_per_trigger=2)
    assert stream_eng.vault.current_snapshot_id() == sid


def test_stream_chunk_spanning_micro_batches(spark, tmp_path):
    """Round-1 regression: a chunk whose files span multiple micro-batches
    (files_per_chunk > maxFilesPerTrigger — the normal WAL layout) must not
    drop events. Batch identity is the exact FILE SET, not the chunk set."""
    import pyspark.sql.functions as F

    wal = str(tmp_path / "wal")
    df = generate_changelog(spark, 2000, seed=9, with_schema_evolution=False)
    # force exactly 4 files in chunk 0 (append one coalesced slice at a time —
    # AQE can't coalesce these into one file like it did to the round-1 WAL)
    for i in range(4):
        (
            df.where(F.pmod(F.col("seq"), F.lit(4)) == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(f"{wal}/chunk=0")
        )

    batch_eng = CDCEngine(spark, str(tmp_path / "batch_tbl"), n_buckets=8)
    batch_eng.replay(wal)
    want = {
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in batch_eng.current_state().collect()
    }

    stream_eng = CDCEngine(spark, str(tmp_path / "stream_tbl"), n_buckets=8)
    # 4 files / 2 per trigger => chunk 0 spans 2 micro-batches
    stream_replay(spark, wal, stream_eng, str(tmp_path / "cp"), max_files_per_trigger=2)
    got = {
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in stream_eng.current_state().collect()
    }
    assert got == want and got


def test_stream_replay_bounds_staged_dirs(spark, tmp_path):
    """keep_staged bounds the per-micro-batch staging copies under the
    checkpoint dir (an always-on stream would otherwise accumulate a second
    full WAL); the table state and exactly-once skip set are unaffected."""
    import os

    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 3000, seed=5), wal, chunk_size=1000)
    eng = CDCEngine(spark, str(tmp_path / "tbl"), n_buckets=8)
    cp = str(tmp_path / "cp")
    stream_replay(spark, wal, eng, cp, max_files_per_trigger=2, keep_staged=1)
    staged = [d for d in os.listdir(cp) if d.startswith("staged-")]
    assert len(staged) <= 1
    assert eng.current_state().count() > 0
    # rerun with wiped spark checkpoint: still a no-op despite swept staging
    sid = eng.vault.current_snapshot_id()
    stream_replay(spark, wal, eng, str(tmp_path / "cp2"), max_files_per_trigger=2, keep_staged=1)
    assert eng.vault.current_snapshot_id() == sid
