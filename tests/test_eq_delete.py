"""Merge-on-read DELETE via equality-delete files (Iceberg v2 analog):
``LakeVault.delete(where, mode="mor")`` commits key-only delete files
instead of COW-rewriting buckets; scans remove rows of deleted keys with a
smaller commit ordinal (re-inserts survive), ``scan_changes`` emits the
deletes, and ``compact()`` folds the delete files away."""

import pyspark.sql.functions as F
import pytest

from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import LakeVault

COLS = [
    ("repo", "string"),
    ("path", "string"),
    ("last_seq", "long"),
    ("lang", "string"),
]
DDL = "repo string, path string, last_seq long, lang string"

ROWS = [
    ("r1", "a.py", 10, "python"),
    ("r1", "b.yml", 11, "yaml"),
    ("r2", "c.py", 12, "python"),
    ("r2", "d.yml", 13, "yaml"),
    ("r3", "e.go", 14, "go"),
    ("r4", "f.yml", 15, "yaml"),
]


def _commit(spark, v, rows, batch_id, delta=False):
    wd = v.new_write_dir(batch_id)
    df = spark.createDataFrame(rows, DDL)
    (
        df.withColumn("__bucket", v.bucket_expr())
        .repartition(2, "__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(wd)
    )
    return v.commit(
        add_write_dir=wd,
        replace_buckets=None,
        batch_id=batch_id,
        manifest={"batch_id": batch_id},
        delta=delta,
    )


def _mk(spark, tmp_path, name="t", n_buckets=8):
    v = LakeVault.create(
        spark, str(tmp_path / name), COLS, key_cols=("repo", "path"), n_buckets=n_buckets
    )
    _commit(spark, v, ROWS, "b0")
    return v


def _state(v):
    return sorted(tuple(r) for r in v.scan().collect())


def test_mor_delete_matches_cow_delete_without_rewriting(spark, tmp_path):
    """Same predicate through both modes → identical final state, but the
    MOR table's original data files are ALL still live (delete files were
    added, nothing rewritten) while the COW table rewrote buckets."""
    v_mor = _mk(spark, tmp_path, "mor")
    v_cow = _mk(spark, tmp_path, "cow")
    before_files = {f["path"] for f in v_mor.snapshot().files}

    v_mor.delete("lang = 'yaml'", mode="mor")
    v_cow.delete("lang = 'yaml'")

    assert _state(v_mor) == _state(v_cow)
    assert all(r[3] != "yaml" for r in _state(v_mor))

    after = v_mor.snapshot().files
    data_after = {f["path"] for f in after if not f.get("eq_delete")}
    dels = [f for f in after if f.get("eq_delete")]
    assert data_after == before_files  # no data file rewritten
    assert dels and all(f.get("delta") for f in dels)
    # COW table, by contrast, replaced its matched buckets
    assert {f["path"] for f in v_cow.snapshot().files} != before_files


def test_mor_delete_reinsert_survives_even_with_lower_seq(spark, tmp_path):
    """Ordinal semantics: the delete kills only rows with a SMALLER commit
    ordinal. A later delta re-insert of the key survives even though its
    last_seq is lower than the deleted row's — commit order, not sequence
    number, scopes the delete (Iceberg sequence-number rule)."""
    v = _mk(spark, tmp_path)
    v.delete("path = 'b.yml'", mode="mor")
    assert ("r1", "b.yml") not in {(r[0], r[1]) for r in _state(v)}
    # re-insert with a LOWER last_seq than the original row (11)
    _commit(spark, v, [("r1", "b.yml", 5, "yaml")], "b1", delta=True)
    got = {(r[0], r[1]): r[2] for r in _state(v)}
    assert got[("r1", "b.yml")] == 5


def test_mor_delete_stacked_then_compact_folds(spark, tmp_path):
    """Two stacked MOR deletes apply together; compact() materializes the
    survivors, drops every eq_delete entry, and re-enables the value-based
    file skipping the live delete files had disabled."""
    v = _mk(spark, tmp_path)
    v.delete("lang = 'yaml'", mode="mor")
    v.delete("repo = 'r3'", mode="mor")
    before = _state(v)
    assert {(r[0], r[1]) for r in before} == {("r1", "a.py"), ("r2", "c.py")}

    snap = v.snapshot()
    assert any(f.get("eq_delete") for f in snap.files)
    # value-based skipping is a no-op while delete files are live
    kept = v.pruned_files(snap, column_ranges={"last_seq": (10_000, None)})
    assert len(kept) == len(snap.files)

    v.compact(buckets=sorted({f["bucket"] for f in snap.files}))
    snap2 = v.snapshot()
    assert not any(f.get("eq_delete") for f in snap2.files)
    assert _state(v) == before
    # skipping works again post-compact: nothing has last_seq >= 10000
    kept2 = v.pruned_files(snap2, column_ranges={"last_seq": (10_000, None)})
    assert len(kept2) == 0


def test_mor_delete_feeds_scan_changes(spark, tmp_path):
    v = _mk(spark, tmp_path)
    a = v.current_snapshot_id()
    v.delete("lang = 'yaml'", mode="mor")
    b = v.current_snapshot_id()
    ch = v.scan_changes(a, b).collect()
    assert sorted((r["repo"], r["path"], r["_change_type"]) for r in ch) == [
        ("r1", "b.yml", "delete"),
        ("r2", "d.yml", "delete"),
        ("r4", "f.yml", "delete"),
    ]
    # pre-image rides along on deletes
    assert all(r["lang"] == "yaml" for r in ch)


def test_mor_delete_conflicts_with_interleaved_write(spark, tmp_path):
    """The delete's key set was computed against its base snapshot; an
    interleaved commit to an affected bucket must conflict, not rebase
    (the new rows might no longer match the predicate)."""
    from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import CommitConflict

    v = _mk(spark, tmp_path)
    snap = v.snapshot()
    keys = (
        v.scan(snapshot_id=snap.snapshot_id)
        .where("lang = 'yaml'")
        .select("repo", "path")
    )
    wd = v.new_write_dir("eqdelete")
    (
        keys.withColumn("__bucket", v.bucket_expr())
        .repartition(1, "__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(wd)
    )
    affected = sorted(
        r["__b"]
        for r in keys.select(v.bucket_expr().alias("__b")).distinct().collect()
    )
    # interleave: another writer lands a delta into one affected bucket
    _commit(spark, v, [("r1", "b.yml", 99, "python")], "rival", delta=True)
    with pytest.raises(CommitConflict):
        v.commit(
            add_write_dir=wd,
            replace_buckets=None,
            batch_id=None,
            delta=True,
            eq_delete=True,
            guard_buckets=affected,
            base_snapshot_id=snap.snapshot_id,
        )


def test_mor_delete_sql_null_predicate_rows_kept(spark, tmp_path):
    v = LakeVault.create(
        spark, str(tmp_path / "t"), COLS, key_cols=("repo", "path"), n_buckets=4
    )
    _commit(spark, v, [("r1", "a.py", 1, None), ("r1", "b.py", 2, "yaml")], "b0")
    v.delete("lang = 'yaml'", mode="mor")
    keys = {(r[0], r[1]) for r in _state(v)}
    assert keys == {("r1", "a.py")} or keys == {("r1", "a.py")}
    assert ("r1", "a.py") in keys  # NULL-predicate row kept per SQL


def test_mor_update_delta_appends_and_matches_cow(spark, tmp_path):
    """update(mode='mor'): matched rows delta-append with assignments
    applied and win the fold by ordinal at equal last_seq; final state
    equals the COW update, no data file rewritten."""
    v_mor = _mk(spark, tmp_path, "umor")
    v_cow = _mk(spark, tmp_path, "ucow")
    before_files = {f["path"] for f in v_mor.snapshot().files}

    v_mor.update({"lang": "'text'"}, where="lang = 'yaml'", mode="mor")
    v_cow.update({"lang": "'text'"}, where="lang = 'yaml'")
    assert _state(v_mor) == _state(v_cow)
    assert not any(r[3] == "yaml" for r in _state(v_mor))

    after = v_mor.snapshot().files
    assert before_files <= {f["path"] for f in after}  # pure append
    assert any(f.get("delta") and not f.get("eq_delete") for f in after)

    # stacked: a second mor update over the first one wins again by ordinal
    v_mor.update({"lang": "'doc'"}, where="lang = 'text'", mode="mor")
    assert not any(r[3] == "text" for r in _state(v_mor))

    # compaction folds the update deltas, state unchanged
    snap = v_mor.snapshot()
    v_mor.compact(buckets=sorted({f["bucket"] for f in snap.files}))
    assert not any(f.get("delta") for f in v_mor.snapshot().files)
    assert sorted(r[3] for r in _state(v_mor)) == sorted(
        "doc" if r[3] == "text" else r[3] for r in _state(v_cow)
    )


def test_mor_update_requires_last_seq(spark, tmp_path):
    v = LakeVault.create(
        spark,
        str(tmp_path / "t"),
        [("repo", "string"), ("path", "string"), ("lang", "string")],
        key_cols=("repo", "path"),
        n_buckets=2,
    )
    with pytest.raises(ValueError, match="last_seq"):
        v.update({"lang": "'x'"}, where="lang = 'y'", mode="mor")
