"""Merge-on-read delta mode: same golden semantics as COW, ~1x write
amplification, compact() folds deltas back into base files."""

import os

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.gen.changelog import generate_changelog, write_wal
from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine
from tests.oracle import replay_oracle


def _state(eng):
    return {
        (r["repo"], r["path"]): (r["content_sha256"], r["last_seq"])
        for r in eng.current_state().collect()
    }


def test_mor_matches_cow_and_oracle(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 6000, seed=21), wal, chunk_size=1500)

    cow = CDCEngine(spark, str(tmp_path / "cow"), n_buckets=8)
    rc = cow.replay(wal)
    mor = CDCEngine(spark, str(tmp_path / "mor"), n_buckets=8, write_mode="mor")
    rm = mor.replay(wal)

    assert _state(mor) == _state(cow)
    exp = replay_oracle(wal)
    assert {k: v["content_sha256"] for k, v in exp.items()} == {
        k: v[0] for k, v in _state(mor).items()
    }
    assert all(b.skipped or b.conserved() for b in rm.batches)

    # the point of MOR: amplification ~1x vs COW's rewrite-the-bucket
    amp = lambda r: sum(b.bytes_written for b in r.batches if not b.skipped) / max(
        sum(b.logical_bytes for b in r.batches if not b.skipped), 1
    )
    assert amp(rm) < 0.6 * amp(rc)
    # and the snapshot actually carries delta entries
    assert any(f.get("delta") for f in mor.vault.snapshot().files)


def test_mor_crash_resume(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 4000, seed=22), wal, chunk_size=1000)
    root = str(tmp_path / "t")
    try:
        CDCEngine(spark, root, n_buckets=4, write_mode="mor").replay(
            wal, fail_after_batches=2
        )
    except RuntimeError:
        pass
    res = CDCEngine(spark, root, n_buckets=4, write_mode="mor").replay(wal)
    assert sum(1 for b in res.batches if b.skipped) >= 2
    exp = replay_oracle(wal)
    got = _state(CDCEngine(spark, root, n_buckets=4, write_mode="mor"))
    assert {k: v["content_sha256"] for k, v in exp.items()} == {k: v[0] for k, v in got.items()}


def test_mor_compact_folds_deltas_then_more_batches(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 4000, seed=23), wal, chunk_size=1000)
    root = str(tmp_path / "t")
    eng = CDCEngine(spark, root, n_buckets=4, write_mode="mor")
    eng.replay(wal, max_batches=2)
    assert any(f.get("delta") for f in eng.vault.snapshot().files)
    before = _state(eng)

    eng.vault.compact(target_file_rows=100_000)
    assert not any(f.get("delta") for f in eng.vault.snapshot().files)
    assert _state(eng) == before

    # later MOR batches keep merging correctly against the compacted base
    eng2 = CDCEngine(spark, root, write_mode="mor")
    eng2.replay(wal)
    exp = replay_oracle(wal)
    got = _state(eng2)
    assert {k: v["content_sha256"] for k, v in exp.items()} == {k: v[0] for k, v in got.items()}


def test_mor_point_lookup_merges(spark, tmp_path):
    """Key-range pruned lookup on a MOR table returns the merged row, not a
    stale base version."""
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 4000, seed=24), wal, chunk_size=1000)
    eng = CDCEngine(spark, str(tmp_path / "t"), n_buckets=4, write_mode="mor")
    eng.replay(wal)
    full = {
        r["path"]: r["content_sha256"]
        for r in eng.current_state().where(F.col("repo") == "org/hot-repo").collect()
    }
    looked = {r["path"]: r["content_sha256"] for r in eng.lookup("org/hot-repo").collect()}
    assert looked == full and looked


def test_mor_schema_evolution_across_base_and_delta(spark, tmp_path):
    """Delta files written under evolved schemas must merge with base files
    written under earlier ones: scan() re-projects by column id per schema
    version BEFORE the LWW merge, so renamed columns keep their values and
    pre-add rows backfill NULL — same contract as COW."""
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 4000, seed=21), wal, chunk_size=800)
    cow = CDCEngine(spark, str(tmp_path / "cow"), n_buckets=8)
    cow.replay(wal)
    mor = CDCEngine(spark, str(tmp_path / "mor"), n_buckets=8, write_mode="mor")
    mor.replay(wal)

    def full(eng):
        return {
            (r["repo"], r["path"]): (r["content_sha256"], r["quality_score"])
            for r in eng.current_state().collect()
        }

    assert full(mor) == full(cow)
    assert "quality_score" in mor.current_state().columns
    assert mor.current_state().where(F.col("quality_score").isNotNull()).count() > 0
