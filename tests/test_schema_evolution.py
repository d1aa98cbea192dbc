"""Schema-evolution replay: add-column and rename-column events mid-stream
(BASELINE.json north_star; reference analog mergeSchema=true writes,
01_ingest_raw_logs.py:217, upgraded to column-id rename promotion)."""

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.gen.changelog import generate_changelog, write_wal
from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine
from tests.oracle import replay_oracle


def test_add_and_rename_column_replay(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 4000, seed=21), wal, chunk_size=800)
    eng = CDCEngine(spark, str(tmp_path / "tbl"), n_buckets=8)
    eng.replay(wal)

    state = eng.current_state()
    # final schema carries the RENAMED column only
    assert "quality_score" in state.columns
    assert "quality" not in state.columns

    # values extracted from props after the add_column event, preserved
    # across the rename (column-id identity, no rewrite)
    got = {
        (r["repo"], r["path"]): r["quality_score"]
        for r in state.where(F.col("quality_score").isNotNull()).collect()
    }
    assert got, "no extracted quality values"

    exp = replay_oracle(wal)
    exp_q = {k: v.get("quality_score") for k, v in exp.items() if v.get("quality_score") is not None}
    assert got == exp_q

    # rows written before the add_column event are null-backfilled
    n_null = state.where(F.col("quality_score").isNull()).count()
    assert n_null > 0

    # schema history is versioned in snapshots (resume-safe, SURVEY §7 hard-(b))
    snap = eng.vault.snapshot()
    assert len(snap.schemas) >= 3  # base, +add, +rename
    names_by_version = [
        [c["name"] for c in s.columns] for _, s in sorted(snap.schemas.items())
    ]
    assert any("quality" in names for names in names_by_version)
    assert "quality_score" in names_by_version[-1]


def test_schema_evolution_survives_resume(spark, tmp_path):
    wal = str(tmp_path / "wal2")
    write_wal(generate_changelog(spark, 4000, seed=22), wal, chunk_size=800)
    root = str(tmp_path / "tbl2")
    import pytest

    with pytest.raises(RuntimeError):
        CDCEngine(spark, root, n_buckets=8).replay(wal, fail_after_batches=3)
    eng = CDCEngine(spark, root, n_buckets=8)
    eng.replay(wal)
    exp = replay_oracle(wal)
    got = {
        (r["repo"], r["path"]): (r["content_sha256"], r["quality_score"])
        for r in eng.current_state().collect()
    }
    assert got == {k: (v["content_sha256"], v.get("quality_score")) for k, v in exp.items()}
