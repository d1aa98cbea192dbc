"""Golden end-to-end replay: engine final state == sequential oracle,
per-row sha256(content) equality (the BASELINE.json invariant), conservation
invariant per batch, idempotent re-replay."""

import pytest

from observability_platform___databricks_etl_pipeline_spark.gen.changelog import generate_changelog, write_wal
from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine
from tests.oracle import replay_oracle

N = 6000


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("walmod") / "wal")
    write_wal(generate_changelog(spark, N, seed=42), d, chunk_size=2000)
    return d


def _final_state(engine):
    rows = engine.current_state().collect()
    return {(r["repo"], r["path"]): r.asDict() for r in rows}


def test_full_replay_matches_oracle(spark, tmp_path, wal):
    engine = CDCEngine(spark, str(tmp_path / "tbl"), n_buckets=8)
    res = engine.replay(wal)

    # conservation invariant (generalizes reference 03:281-297) per batch
    for b in res.batches:
        assert b.skipped or b.conserved(), f"not conserved: {b}"

    got = _final_state(engine)
    exp = replay_oracle(wal)
    assert set(got) == set(exp), (
        f"key sets differ: extra={list(set(got)-set(exp))[:5]} missing={list(set(exp)-set(got))[:5]}"
    )
    mismatch = [
        (k, got[k]["content_sha256"], exp[k]["content_sha256"])
        for k in exp
        if got[k]["content_sha256"] != exp[k]["content_sha256"]
    ]
    assert not mismatch, f"{len(mismatch)} sha mismatches, first: {mismatch[:3]}"
    # full row equality on shared semantics
    for k in exp:
        for f in ("commit", "lang", "content", "last_seq"):
            assert got[k][f] == exp[k][f], (k, f, got[k][f], exp[k][f])


def test_replay_is_idempotent(spark, tmp_path, wal):
    root = str(tmp_path / "tbl2")
    engine = CDCEngine(spark, root, n_buckets=8)
    engine.replay(wal)
    sid = engine.vault.current_snapshot_id()
    state1 = _final_state(engine)

    res2 = CDCEngine(spark, root, n_buckets=8).replay(wal)  # fresh engine, same table
    assert all(b.skipped for b in res2.batches)
    assert engine.vault.current_snapshot_id() == sid  # no new snapshots
    assert _final_state(CDCEngine(spark, root, n_buckets=8)) == state1


def test_quarantine_and_metrics(spark, tmp_path, wal):
    root = str(tmp_path / "tbl3")
    engine = CDCEngine(spark, root, n_buckets=8)
    res = engine.replay(wal)
    q = spark.read.parquet(engine.quarantine_dir)
    assert q.count() == sum(b.quarantined for b in res.batches)
    assert q.count() > 0
    roll = spark.read.parquet(engine.metrics_dir)
    assert roll.count() > 0
    assert {"repo", "events", "p95_content_len", "batch_id"} <= set(roll.columns)
    # manifests carry offsets + metrics for every non-skipped batch
    for b in res.batches:
        man = engine.vault.manifest(b.batch_id)
        assert man is not None and man["offsets"] and man["metrics"]["rows_read"] == b.rows_read


def test_accessors_metrics_quarantine_lineage(spark, tmp_path, wal):
    root = str(tmp_path / "tbl4")
    eng = CDCEngine(spark, root, n_buckets=8)
    res = eng.replay(wal)
    # lineage: one manifest per applied batch, in commit order, conserving
    manifests = eng.lineage()
    assert len(manifests) == sum(1 for b in res.batches if not b.skipped)
    for man in manifests:
        assert man["offsets"] and man["lineage"]
    # quarantine accessor sees the dead-letter rows
    assert eng.quarantine().count() == sum(b.quarantined for b in res.batches)
    # rollup accessor: conservation against batch metrics at repo grain
    roll = eng.ingest_metrics()
    assert roll.where("repo = 'org/hot-repo'").count() > 0


def test_engine_expire_bounds_side_tables(spark, tmp_path, wal):
    """CDCEngine.expire: quarantine / ingest_metrics per-batch subdirs and
    lineage manifest JSONs older than the retention window are swept, while
    the exactly-once batch-id set stays complete (re-replay still skips) and
    retained side data stays queryable."""
    import os

    root = str(tmp_path / "tbl-exp")
    engine = CDCEngine(spark, root, n_buckets=8, with_rollup=True)
    res = engine.replay(wal)
    n_batches = len([b for b in res.batches if not b.skipped])
    assert n_batches >= 3
    assert len(os.listdir(engine.metrics_dir)) == n_batches

    engine.expire(keep_last=2, keep_side_batches=1)
    last_bid = engine.vault.snapshot().committed_batches[-1]
    kept_metrics = os.listdir(engine.metrics_dir)
    assert kept_metrics == [f"batch_id={last_bid}"]
    if os.path.isdir(engine.quarantine_dir):
        assert all(
            d == f"batch_id={last_bid}" for d in os.listdir(engine.quarantine_dir)
        )
    mdir = os.path.join(engine.vault.vault_dir, "manifests")
    assert [f[:-5] for f in os.listdir(mdir)] == [last_bid]
    # retained rollup still reads; exactly-once set survives retention
    assert engine.ingest_metrics().count() > 0
    res2 = CDCEngine(spark, root, n_buckets=8, with_rollup=False).replay(wal)
    assert all(b.skipped for b in res2.batches)


def test_expire_tombstones_block_rollup_resurrection(spark, tmp_path, wal):
    """replay() after expire() must NOT backfill the side metrics the
    retention pass just removed (the write dirs are still on disk, so the
    backfill would regrow every swept dir without the tombstone)."""
    import os

    root = str(tmp_path / "tbl-ts")
    eng = CDCEngine(spark, root, n_buckets=8, with_rollup=True)
    eng.replay(wal)
    eng.expire(keep_last=10, keep_side_batches=1)  # keep data files, sweep side dirs
    last_bid = eng.vault.snapshot().committed_batches[-1]
    assert os.listdir(eng.metrics_dir) == [f"batch_id={last_bid}"]

    res = CDCEngine(spark, root, n_buckets=8, with_rollup=True).replay(wal)
    assert all(b.skipped for b in res.batches)
    assert os.listdir(eng.metrics_dir) == [f"batch_id={last_bid}"]  # not resurrected


@pytest.mark.parametrize("crash_after", [2, 6, 12])
def test_crash_mid_expire_rerun_and_resume(spark, tmp_path, wal, crash_after, monkeypatch):
    """r4 verdict #6 — end-to-end crash DURING expire(): kill the deletion
    pass after N os.remove calls, rerun expire, resume replay. Must hold:
    no leaked orphans (on-disk parquet == live snapshot files after a final
    sweep), no resurrected side dirs (retention tombstones respected by the
    resumed replay), exactly-once intact, final state == oracle."""
    import os as _os
    import shutil as _shutil

    root = str(tmp_path / f"tbl-{crash_after}")
    eng = CDCEngine(spark, root, n_buckets=8, with_rollup=True)
    eng.replay(wal, max_batches=2)

    real_remove = _os.remove
    calls = {"n": 0}

    def exploding_remove(path):
        calls["n"] += 1
        if calls["n"] > crash_after:
            raise OSError(f"injected crash at remove #{calls['n']}: {path}")
        return real_remove(path)

    monkeypatch.setattr(_os, "remove", exploding_remove)
    crashed = False
    try:
        eng.expire(keep_last=1, keep_side_batches=1)
    except OSError:
        crashed = True
    monkeypatch.setattr(_os, "remove", real_remove)
    if not crashed:
        pytest.skip(f"fewer than {crash_after} removals at this shape")

    # rerun the SAME expire — must complete despite half-deleted metadata
    eng.expire(keep_last=1, keep_side_batches=1)

    # resume: the first 2 batches skip (exactly-once survives the crashed
    # expiry), every remaining chunk applies
    eng2 = CDCEngine(spark, root, n_buckets=8, with_rollup=True)
    res = eng2.replay(wal)
    assert [b.skipped for b in res.batches] == [True, True] + [False] * (
        len(res.batches) - 2
    )

    # swept batches stay swept (no resurrected side dirs) — only batches
    # newer than the retention tombstones may own side subdirs
    tombstoned = eng2._expired_side_batches()
    assert tombstoned
    for d in (eng2.quarantine_dir, eng2.metrics_dir):
        if _os.path.isdir(d):
            for sub in _os.listdir(d):
                assert sub.split("=", 1)[1] not in tombstoned, f"resurrected: {d}/{sub}"

    # final state still equals the sequential oracle
    got = _final_state(eng2)
    exp = replay_oracle(wal)
    assert {k: v["content_sha256"] for k, v in got.items()} == {
        k: v["content_sha256"] for k, v in exp.items()
    }

    # no orphans: after a final zero-grace sweep, on-disk parquet under
    # data/ is exactly the union of live snapshots' file lists
    eng2.vault.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    live = set()
    for sid in eng2.vault.snapshot_ids():
        live.update(f["path"] for f in eng2.vault.snapshot(sid).files)
    on_disk = {
        _os.path.relpath(_os.path.join(dp, fn), eng2.vault.root)
        for dp, _dn, fns in _os.walk(eng2.vault.data_dir)
        for fn in fns
        if fn.endswith(".parquet")
    }
    assert on_disk == live
