"""Branches, tags and the write-audit-publish flow (Iceberg refs analog).

Reference parity: the reference notebooks validate AFTER appending to the
live Delta table (02_enrich_events.py's quality checks run post-write); WAP
moves the audit before visibility. The reference has no branching at all —
this is Iceberg-surface parity for the from-scratch table format.
"""

import os

import pytest

from observability_platform___databricks_etl_pipeline_spark.gen import generate_changelog, write_wal
from observability_platform___databricks_etl_pipeline_spark.plans import CDCEngine
from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import (
    CommitConflict,
    LakeVault,
)
from observability_platform___databricks_etl_pipeline_spark.sources.wal import list_chunks


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wal-branch"))
    write_wal(generate_changelog(spark, 4000, seed=31), d, chunk_size=1000)
    return d


def _state(eng):
    return {
        (r["repo"], r["path"]): (r["commit"], r["last_seq"])
        for r in eng.current_state().select("repo", "path", "commit", "last_seq").collect()
    }


def test_wap_stage_audit_publish(spark, tmp_path, wal):
    """The canonical flow: stage on a branch → main isolated → audit the
    staged diff → publish → main equals a straight full replay, and the
    published batches stay exactly-once on main."""
    tbl = str(tmp_path / "tbl")
    ref = str(tmp_path / "ref")
    chunks = list_chunks(wal)
    assert len(chunks) >= 3

    eng = CDCEngine(spark, tbl, n_buckets=8)
    eng.replay(wal, chunks=chunks[:2])
    fork = eng.vault.current_snapshot_id()
    main_before = _state(eng)

    eng.vault.create_branch("audit")
    staged = CDCEngine(spark, tbl, n_buckets=8, branch="audit")
    staged.replay(wal, chunks=chunks[2:])

    # isolation: main head and content untouched while staged
    assert eng.vault.current_snapshot_id() == fork
    assert _state(eng) == main_before

    # audit: staged state and its diff vs the fork are readable on the branch
    head_b = staged.vault.current_snapshot_id()
    assert head_b > fork
    diff = staged.vault.scan_changes(fork, head_b)
    assert diff.count() > 0
    staged_state = _state(staged)

    published = eng.vault.publish_branch("audit")
    # publish squashes the staged commits into ONE atomic main snapshot
    assert published == fork + 1
    assert eng.vault.current_snapshot_id() == published
    psnap = eng.vault.snapshot(published)
    assert psnap.summary["operation"] == "publish"
    assert psnap.summary["published_from"] == head_b
    assert _state(eng) == staged_state
    assert "audit" not in eng.vault.branches()  # publish drops by default

    # published state == straight replay of the whole WAL (content-level)
    reng = CDCEngine(spark, ref, n_buckets=8)
    reng.replay(wal)
    assert _state(eng) == _state(reng)

    # exactly-once carried to main: every chunk replays as a skip
    res = eng.replay(wal)
    assert all(b.skipped for b in res.batches)


def test_publish_conflict_when_main_advances(spark, tmp_path, wal):
    tbl = str(tmp_path / "tbl")
    chunks = list_chunks(wal)
    eng = CDCEngine(spark, tbl, n_buckets=8)
    eng.replay(wal, chunks=chunks[:1])

    eng.vault.create_branch("b")
    staged = CDCEngine(spark, tbl, n_buckets=8, branch="b")
    staged.replay(wal, chunks=chunks[1:2])

    # main advances past the fork with a DIFFERENT chunk
    eng.replay(wal, chunks=chunks[2:3])

    with pytest.raises(CommitConflict):
        eng.vault.publish_branch("b")
    # nothing partially merged: main still exactly its own head's content
    assert "b" in eng.vault.branches()
    eng.vault.drop_branch("b")


def test_publish_crash_resume_is_idempotent(spark, tmp_path, wal):
    """A publish that crashed after its CAS (before dropping the branch) is
    completed by simply calling publish again: the identical already-claimed
    snapshot is recognized, never conflated with a racing main commit."""
    tbl = str(tmp_path / "tbl")
    chunks = list_chunks(wal)
    eng = CDCEngine(spark, tbl, n_buckets=8)
    eng.replay(wal, chunks=chunks[:1])
    fork = eng.vault.current_snapshot_id()

    eng.vault.create_branch("b")
    staged = CDCEngine(spark, tbl, n_buckets=8, branch="b")
    staged.replay(wal, chunks=chunks[1:3])  # >= 2 staged commits squash
    head_b = eng.vault.branch("b").current_snapshot_id()
    assert head_b >= fork + 2

    # "crash" after the CAS: publish without dropping, then retry
    first = eng.vault.publish_branch("b", drop=False)
    assert first == fork + 1
    state_after = _state(CDCEngine(spark, tbl, n_buckets=8))
    again = eng.vault.publish_branch("b")  # retry completes + drops
    assert again == first
    assert eng.vault.current_snapshot_id() == first
    assert _state(CDCEngine(spark, tbl, n_buckets=8)) == state_after
    assert "b" not in eng.vault.branches()


def test_expire_retains_branch_files_until_drop(spark, tmp_path, wal):
    tbl = str(tmp_path / "tbl")
    chunks = list_chunks(wal)
    eng = CDCEngine(spark, tbl, n_buckets=8)
    eng.replay(wal, chunks=chunks[:1])

    eng.vault.create_branch("keepme")
    staged = CDCEngine(spark, tbl, n_buckets=8, branch="keepme")
    staged.replay(wal, chunks=chunks[1:2])
    b = eng.vault.branch("keepme")
    branch_files = {f["path"] for f in b.snapshot().files}
    staged_state = _state(staged)

    # churn main so expire has something to do, then expire with zero grace
    eng.replay(wal, chunks=chunks[2:3])
    eng.vault.compact()
    eng.expire(keep_last=1)
    # every branch-referenced file survived; the staged state still reads
    for rel in branch_files:
        assert os.path.exists(os.path.join(tbl, rel)), rel
    assert _state(CDCEngine(spark, tbl, n_buckets=8, branch="keepme")) == staged_state

    # after drop, branch-only files become orphans and the next expire
    # sweeps them (grace 0: no writers in flight here)
    eng.vault.drop_branch("keepme")
    eng.vault.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    main_files = {f["path"] for f in eng.vault.snapshot().files}
    gone = branch_files - main_files
    assert gone, "branch should have had files of its own"
    for rel in gone:
        assert not os.path.exists(os.path.join(tbl, rel)), rel
    # main unaffected
    assert eng.vault.scan().count() > 0


def test_tag_pins_snapshot_through_expire(spark, tmp_path, wal):
    tbl = str(tmp_path / "tbl")
    chunks = list_chunks(wal)
    eng = CDCEngine(spark, tbl, n_buckets=8)
    eng.replay(wal, chunks=chunks[:1])
    tagged = eng.vault.create_tag("v1")
    rows_at_tag = eng.vault.scan(snapshot_id=tagged).count()

    eng.replay(wal, chunks=chunks[1:3])
    eng.vault.compact()
    eng.vault.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)

    # the tagged snapshot survived retention and still scans
    assert tagged in eng.vault.snapshot_ids()
    assert eng.vault.resolve_tag("v1") == tagged
    assert eng.vault.scan(snapshot_id=tagged).count() == rows_at_tag

    # tag names are claimed with a CAS: a second create for the same name
    # must fail loudly instead of silently re-pinning (racing operators)
    with pytest.raises(ValueError):
        eng.vault.create_tag("v1")

    # dropping the tag releases it: next expire removes the snapshot
    eng.vault.drop_tag("v1")
    eng.vault.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    assert tagged not in eng.vault.snapshot_ids()


def test_branch_guards(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v = LakeVault.create(spark, root, [("repo", "string"), ("path", "string")])
    v.create_branch("x")
    bx = v.branch("x")
    with pytest.raises(ValueError):
        bx.create_branch("y")  # branch-of-branch: main handle only
    with pytest.raises(ValueError):
        bx.expire_snapshots()  # maintenance: main handle only
    with pytest.raises(ValueError):
        v.create_branch("x")  # duplicate
    with pytest.raises(FileNotFoundError):
        v.branch("nope")
    with pytest.raises(ValueError):
        v.create_branch("bad/name")
    # '-' and '.' are structural in attempt tokens (w-<branch>.<id>-…):
    # a dashed/dotted branch name would break the GC's token parse
    with pytest.raises(ValueError):
        v.create_branch("my-branch")
    with pytest.raises(ValueError):
        v.create_branch("my.branch")
    # empty branch publish is a no-op fast path
    assert v.publish_branch("x") == v.current_snapshot_id()
    assert "x" not in v.branches()


def test_expire_never_sweeps_live_branch_staging_dir(spark, tmp_path, wal):
    """Staging dirs carry a NAMESPACED attempt token (<branch>.<id>): a live
    branch writer staging for branch_head+1 must survive MAIN's expire even
    after main's numbering races far past the branch-local id (a bare id
    compared against main's head would look long-dead) — and the same dir
    becomes sweepable once its branch is dropped, because nothing of a
    dropped branch can still be in flight past the grace window."""
    tbl = str(tmp_path / "tbl")
    chunks = list_chunks(wal)
    eng = CDCEngine(spark, tbl, n_buckets=8)
    eng.replay(wal, chunks=chunks[:1])  # main head = 1
    eng.vault.create_branch("slow")
    bv = eng.vault.branch("slow")
    staging = bv.new_write_dir("inflight")  # stages for branch head + 1
    tok = f"-slow.{bv.current_snapshot_id() + 1}-"
    assert tok in os.path.basename(staging)
    eng.replay(wal, chunks=chunks[1:])  # main head >> branch-local attempt id
    assert eng.vault.current_snapshot_id() > bv.current_snapshot_id() + 1
    eng.vault.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    assert os.path.isdir(staging), "live branch writer's staging dir swept"
    eng.vault.drop_branch("slow")
    eng.vault.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    assert not os.path.isdir(staging), "dropped branch's staging dir leaked"
