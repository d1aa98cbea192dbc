import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import LakeVault


def _mk(spark, tmp_path, rows):
    root = str(tmp_path / "tbl")
    v = LakeVault.create(
        spark, root, [("repo", "string"), ("path", "string"), ("last_seq", "long"), ("is_deleted", "boolean")]
    )
    wd = v.new_write_dir("init")
    df = spark.createDataFrame(rows, "repo string, path string, last_seq long, is_deleted boolean")
    (
        df.withColumn("__bucket", v.bucket_expr())
        .repartition(2, "__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(wd)
    )
    v.commit(add_write_dir=wd, replace_buckets=None, batch_id="b0", manifest={"batch_id": "b0"})
    return v


def test_create_commit_scan(spark, tmp_path):
    v = _mk(spark, tmp_path, [("r1", "a.py", 1, False), ("r2", "b.py", 2, False)])
    assert v.current_snapshot_id() == 1
    got = {(r["repo"], r["path"]) for r in v.scan().collect()}
    assert got == {("r1", "a.py"), ("r2", "b.py")}
    # manifest stats registered
    snap = v.snapshot()
    assert sum(f["rows"] for f in snap.files) == 2
    assert all(f["bucket"] is not None for f in snap.files)


def test_idempotent_commit(spark, tmp_path):
    v = _mk(spark, tmp_path, [("r1", "a.py", 1, False)])
    sid = v.current_snapshot_id()
    again = v.commit(add_write_dir=None, replace_buckets=[], batch_id="b0", manifest={})
    assert again == sid  # replayed batch is a no-op


def test_time_travel_and_bucket_pruning(spark, tmp_path):
    v = _mk(spark, tmp_path, [("r1", "a.py", 1, False)])
    wd = v.new_write_dir("b1")
    df2 = spark.createDataFrame([("r9", "z.py", 9, False)], "repo string, path string, last_seq long, is_deleted boolean")
    (
        df2.withColumn("__bucket", v.bucket_expr())
        .repartition(1, "__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(wd)
    )
    v.commit(add_write_dir=wd, replace_buckets=[], batch_id="b1", manifest={"batch_id": "b1"})
    assert v.scan().count() == 2
    assert v.scan(snapshot_id=1).count() == 1  # time travel
    # bucket pruning reads only matching files
    b_of_r9 = v.scan().where(F.col("repo") == "r9").collect()
    bucket = [f["bucket"] for f in v.snapshot().files if f["rows"] == 1 and f["path"].find("b1") >= 0]
    pruned = v.scan(buckets=bucket[:1])
    assert pruned.count() >= 1
    assert b_of_r9[0]["repo"] == "r9"


def test_schema_add_and_rename_by_id(spark, tmp_path):
    v = _mk(spark, tmp_path, [("r1", "a.py", 1, False)])
    s1 = v.snapshot().schema.add_column("quality", "double")
    # commit a new file under evolved schema
    wd = v.new_write_dir("ev")
    df2 = spark.createDataFrame(
        [("r2", "b.py", 2, False, 0.5)],
        "repo string, path string, last_seq long, is_deleted boolean, quality double",
    )
    (
        df2.withColumn("__bucket", v.bucket_expr())
        .repartition(1, "__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(wd)
    )
    v.commit(add_write_dir=wd, replace_buckets=[], batch_id="b1", manifest={}, new_schema=s1)
    rows = {r["repo"]: r for r in v.scan().collect()}
    assert rows["r1"]["quality"] is None  # null-backfilled old file
    assert rows["r2"]["quality"] == 0.5

    # rename: metadata-only, old files still readable, data preserved
    s2 = v.snapshot().schema.rename_column("quality", "quality_score")
    v.commit(add_write_dir=None, replace_buckets=[], batch_id="b2", manifest={}, new_schema=s2)
    rows = {r["repo"]: r for r in v.scan().collect()}
    assert rows["r2"]["quality_score"] == 0.5
    assert "quality" not in v.scan().columns


def test_compact_and_expire(spark, tmp_path):
    v = _mk(spark, tmp_path, [(f"r{i}", f"p{i}.py", i, False) for i in range(20)])
    before_files = len(v.snapshot().files)
    v.compact()
    assert v.scan().count() == 20
    removed = v.expire_snapshots(keep_last=1)
    assert removed  # old snapshots gone
    assert v.scan().count() == 20  # current state intact
    assert len(v.snapshot().files) <= before_files + 2
