"""plans/sparkhash.py must be BIT-EXACT with Spark's F.hash / the LakeVault
bucket function — a single wrong bit silently mis-prunes point probes."""

import datetime
import random
import string

import pyspark.sql.functions as F
import pytest

from observability_platform___databricks_etl_pipeline_spark.plans.sparkhash import bucket_of, spark_hash


def _spark_hash_rows(spark, rows, ddl, cols):
    df = spark.createDataFrame(rows, ddl)
    return [r["h"] for r in df.select(F.hash(*cols).alias("h")).collect()]


def test_string_pairs_match_f_hash(spark):
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + "/._-"
    rows = []
    for _ in range(200):
        repo = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        path = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        rows.append((repo, path))
    rows += [
        ("", ""),
        ("a", ""),
        ("", "b"),
        ("naïve/ünïcode", "路径/файл.py"),  # multi-byte UTF-8 incl. >0x7f tails
        ("exactly4", "len7abc"),
        (None, "x"),
        ("x", None),
        (None, None),
    ]
    got = [spark_hash([r, p]) for r, p in rows]
    want = _spark_hash_rows(spark, rows, "repo string, path string", ["repo", "path"])
    assert got == want


def test_numeric_and_temporal_types_match_f_hash(spark):
    rng = random.Random(7)
    rows = [
        (
            rng.randint(-(2**31), 2**31 - 1),
            rng.randint(-(2**62), 2**62),
            rng.random() * 1e6 - 5e5,
            rng.random() < 0.5,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=rng.randint(0, 10**7)),
        )
        for _ in range(100)
    ]
    rows.append((0, 0, -0.0, False, datetime.datetime(1970, 1, 1)))
    # pre-epoch with sub-second component + far-future: the int(total_
    # seconds()) truncation bug hashed both wrong (r5 ADVICE, fixed r6 with
    # exact timedelta floor-division)
    rows.append((1, 1, 1.0, True, datetime.datetime(1969, 12, 31, 23, 59, 59, 500000)))
    rows.append((2, 2, 2.0, False, datetime.datetime(1901, 7, 4, 3, 2, 1, 123457)))
    rows.append((3, 3, 3.0, True, datetime.datetime(2260, 1, 2, 3, 4, 5, 999999)))
    rows.append((None, None, None, None, None))
    ddl = "i int, l long, d double, b boolean, ts timestamp"
    got = [
        spark_hash([i, l, d, b, ts], types=["int", "long", "double", "boolean", "timestamp"])
        for i, l, d, b, ts in rows
    ]
    want = _spark_hash_rows(spark, rows, ddl, ["i", "l", "d", "b", "ts"])
    assert got == want


def test_bucket_of_matches_bucket_expr(spark, tmp_path):
    from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import LakeVault

    v = LakeVault.create(
        spark,
        str(tmp_path / "t"),
        [("repo", "string"), ("path", "string"), ("last_seq", "long")],
        key_cols=("repo", "path"),
        n_buckets=16,
    )
    rows = [(f"org/repo-{i % 7}", f"src/f{i}.py", i) for i in range(50)]
    df = spark.createDataFrame(rows, "repo string, path string, last_seq long")
    want = {
        (r["repo"], r["path"]): r["b"]
        for r in df.select("repo", "path", v.bucket_expr().alias("b")).collect()
    }
    for (repo, path), b in want.items():
        assert bucket_of([repo, path], 16) == b


def test_scan_key_equals_prunes_to_one_bucket(spark, tmp_path):
    from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import LakeVault
    from observability_platform___databricks_etl_pipeline_spark.plans.sparkhash import bucket_of

    v = LakeVault.create(
        spark,
        str(tmp_path / "t"),
        [("repo", "string"), ("path", "string"), ("last_seq", "long")],
        key_cols=("repo", "path"),
        n_buckets=16,
    )
    rows = [(f"org/r{i % 5}", f"f{i}.py", i) for i in range(200)]
    wd = v.new_write_dir("b0")
    (
        spark.createDataFrame(rows, "repo string, path string, last_seq long")
        .withColumn("__bucket", v.bucket_expr())
        .repartition(4, "__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(wd)
    )
    v.commit(add_write_dir=wd, replace_buckets=None, batch_id="b0")

    probe = ("org/r3", "f13.py")
    got = v.scan(key_equals=probe).where(
        (F.col("repo") == probe[0]) & (F.col("path") == probe[1])
    )
    assert [tuple(r) for r in got.collect()] == [("org/r3", "f13.py", 13)]
    # the probe touched only the key's bucket
    snap = v.snapshot()
    b = bucket_of(list(probe), 16)
    only_bucket = v.pruned_files(snap, buckets=[b])
    assert {f["path"] for f in only_bucket} < {f["path"] for f in snap.files}

    with pytest.raises(ValueError, match="key_equals"):
        v.scan(key_equals=("only-repo",))
