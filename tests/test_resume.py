"""Resume-from-checkpoint mid-replay: kill after batch k, restart, assert
identical final state and no double-apply (BASELINE.json north_star)."""

import pytest

from observability_platform___databricks_etl_pipeline_spark.gen.changelog import generate_changelog, write_wal
from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine
from tests.oracle import replay_oracle


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("walres") / "wal")
    write_wal(generate_changelog(spark, 5000, seed=13), d, chunk_size=1000)
    return d


def test_crash_and_resume_equals_straight_replay(spark, tmp_path, wal):
    # straight replay
    a = CDCEngine(spark, str(tmp_path / "a"), n_buckets=8)
    a.replay(wal)
    state_a = {
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in a.current_state().collect()
    }

    # crashed replay: die after 2 batches, then resume with a fresh engine
    root_b = str(tmp_path / "b")
    b1 = CDCEngine(spark, root_b, n_buckets=8)
    with pytest.raises(RuntimeError, match="simulated crash"):
        b1.replay(wal, fail_after_batches=2)
    cp = b1.checkpoint()
    assert cp is not None and len(cp["chunks_committed"]) == 2

    b2 = CDCEngine(spark, root_b, n_buckets=8)
    res = b2.replay(wal)
    assert sum(1 for x in res.batches if x.skipped) == 2  # no double-apply
    state_b = {
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in b2.current_state().collect()
    }
    assert state_a == state_b
    assert state_a  # non-trivial

    # and both equal the oracle
    exp = replay_oracle(wal)
    assert {k: v["content_sha256"] for k, v in exp.items()} == {
        k: v[0] for k, v in state_b.items()
    }


def test_crash_mid_batch_before_commit(spark, tmp_path, wal):
    """A batch whose data files were written but whose pointer swap never
    happened must re-apply cleanly (orphan files are invisible)."""
    root = str(tmp_path / "c")
    eng = CDCEngine(spark, root, n_buckets=8)
    eng.replay(wal, max_batches=1)
    sid = eng.vault.current_snapshot_id()
    # simulate a dead attempt: stage a write dir that never got committed
    orphan = eng.vault.new_write_dir("deadattempt")
    (eng.current_state().limit(5).withColumn("__bucket", eng.vault.bucket_expr())
     .write.mode("overwrite").partitionBy("__bucket").parquet(orphan))
    assert eng.vault.current_snapshot_id() == sid  # invisible
    res = CDCEngine(spark, root, n_buckets=8).replay(wal)
    assert res.snapshot_id > sid
    # final state still equals oracle
    exp = replay_oracle(wal)
    got = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in CDCEngine(spark, root, n_buckets=8).current_state().collect()
    }
    assert got == {k: v["content_sha256"] for k, v in exp.items()}


def test_rollup_backfill_on_resume(spark, tmp_path):
    """The rollup is async derived data: a crash can commit a batch without
    its rollup. Resume must backfill the hole idempotently."""
    import os
    import shutil

    from observability_platform___databricks_etl_pipeline_spark.gen.changelog import generate_changelog, write_wal
    from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine

    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 4000, seed=3), wal, chunk_size=2000)
    eng = CDCEngine(spark, str(tmp_path / "tbl"), n_buckets=4)
    res = eng.replay(wal)
    applied = [b for b in res.batches if not b.skipped]
    gone = os.path.join(eng.metrics_dir, f"batch_id={applied[0].batch_id}")
    assert os.path.isdir(gone)
    shutil.rmtree(gone)  # simulate crash-between-commit-and-rollup

    res2 = CDCEngine(spark, str(tmp_path / "tbl"), n_buckets=4).replay(wal)
    assert all(b.skipped for b in res2.batches)  # nothing re-applied
    assert os.path.isdir(gone)  # rollup hole backfilled
    roll = spark.read.parquet(eng.metrics_dir)
    assert roll.where(f"batch_id = '{applied[0].batch_id}'").count() > 0
