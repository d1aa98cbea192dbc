"""Round-5 review-finding regressions: NaN parity between the engine's
scan_changes and the lakevault data source's changes feed, and the stream
writer's resilience to the orphan GC sweeping its staging dir while idle."""

import math
import os
import shutil

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import LakeVault

COLS = [
    ("repo", "string"),
    ("path", "string"),
    ("last_seq", "long"),
    ("score", "double"),
]
DDL = "repo string, path string, last_seq long, score double"


def _commit(spark, v, rows, batch_id, replace_buckets=None):
    wd = v.new_write_dir(batch_id)
    df = spark.createDataFrame(rows, DDL)
    (
        df.withColumn("__bucket", v.bucket_expr())
        .repartition(1, "__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(wd)
    )
    return v.commit(
        add_write_dir=wd,
        replace_buckets=replace_buckets,
        batch_id=batch_id,
        manifest={"batch_id": batch_id},
    )


def test_nan_rows_are_unchanged_in_both_change_feeds(spark, tmp_path):
    """Spark's eqNullSafe says NaN == NaN (a value equal to itself), so a
    carried row whose double column holds NaN at both snapshots is NOT a
    change — in the engine's scan_changes AND in the data source's
    feed=changes replica (plain pandas == would call it an update)."""
    root = str(tmp_path / "t")
    # one bucket: the carried NaN row shares its bucket with the new row,
    # so the diff actually has to LOOK at it
    v = LakeVault.create(spark, root, COLS, key_cols=("repo", "path"), n_buckets=1)
    nan = float("nan")
    a = _commit(spark, v, [("r1", "a.py", 1, nan), ("r1", "b.py", 2, 0.5)], "b0")
    b = _commit(
        spark,
        v,
        [("r1", "a.py", 1, nan), ("r1", "b.py", 2, 0.5), ("r9", "new.py", 3, 1.0)],
        "b1",
        replace_buckets=[0],
    )

    eng_rows = v.scan_changes(a, b).collect()
    assert [(r["repo"], r["path"], r["_change_type"]) for r in eng_rows] == [
        ("r9", "new.py", "insert")
    ]

    from observability_platform___databricks_etl_pipeline_spark.sources.lakevault_ds import register

    register(spark)
    ds_rows = (
        spark.read.format("lakevault")
        .option("feed", "changes")
        .option("fromSnapshotId", a)
        .option("toSnapshotId", b)
        .load(root)
        .collect()
    )
    assert [(r["repo"], r["path"], r["_change_type"]) for r in ds_rows] == [
        ("r9", "new.py", "insert")
    ]
    # and an ACTUAL NaN transition still surfaces (NaN -> value = update)
    c = _commit(
        spark,
        v,
        [("r1", "a.py", 4, 2.0), ("r1", "b.py", 2, 0.5), ("r9", "new.py", 3, 1.0)],
        "b2",
        replace_buckets=[0],
    )
    got = {
        (r["repo"], r["path"]): r["_change_type"]
        for r in v.scan_changes(b, c).collect()
    }
    assert got == {("r1", "a.py"): "update"}
    ds_got = {
        (r["repo"], r["path"]): (r["_change_type"], r["_before"]["score"])
        for r in spark.read.format("lakevault")
        .option("feed", "changes")
        .option("fromSnapshotId", b)
        .option("toSnapshotId", c)
        .load(root)
        .collect()
    }
    assert set(ds_got) == {("r1", "a.py")}
    kind, before_score = ds_got[("r1", "a.py")]
    assert kind == "update" and math.isnan(before_score)


def test_ds_writer_survives_swept_staging_dir(spark, tmp_path):
    """The stream writer's staging dir lives for the writer's lifetime; if
    the orphan GC sweeps it while the stream idles (its attempt token goes
    stale after the first commit), the next batch must recreate it — and a
    commit must refuse to register paths that vanished underneath it."""
    import pyarrow as pa
    import pytest

    from observability_platform___databricks_etl_pipeline_spark.sources.lakevault_ds import (
        _LakeVaultWriterCore,
    )

    root = str(tmp_path / "t")
    v = LakeVault.create(spark, root, COLS, key_cols=("repo", "path"), n_buckets=2)
    _commit(spark, v, [("r1", "a.py", 1, 0.5)], "b0")

    schema = spark.createDataFrame([], DDL).schema
    core = _LakeVaultWriterCore({"path": root}, schema)
    # simulate the GC winning while the stream idles
    shutil.rmtree(core.write_dir)

    batch = pa.record_batch(
        {
            "repo": ["r2"],
            "path": ["b.py"],
            "last_seq": pa.array([2], pa.int64()),
            "score": pa.array([1.0], pa.float64()),
        }
    )
    msg = core.write_batches(iter([batch]))  # recreates the dir
    assert msg.entries and os.path.exists(
        os.path.join(root, msg.entries[0]["path"])
    )
    core.commit_entries([msg], "lvds-test-0")
    got = (
        LakeVault.load(spark, root)
        .scan()
        .where(F.col("repo") == "r2")
        .collect()
    )
    assert [(r["path"], r["score"]) for r in got] == [("b.py", 1.0)]

    # vanished-path guard: a file deleted between write and commit fails
    # the batch loudly instead of committing a manifest to nowhere
    msg2 = core.write_batches(
        iter(
            [
                pa.record_batch(
                    {
                        "repo": ["r3"],
                        "path": ["c.py"],
                        "last_seq": pa.array([3], pa.int64()),
                        "score": pa.array([2.0], pa.float64()),
                    }
                )
            ]
        )
    )
    os.unlink(os.path.join(root, msg2.entries[0]["path"]))
    with pytest.raises(RuntimeError, match="vanished"):
        core.commit_entries([msg2], "lvds-test-1")
