import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.gen.changelog import generate_changelog, write_wal


def test_generator_is_deterministic(spark):
    a = generate_changelog(spark, 2000, seed=42).orderBy("seq").collect()
    b = generate_changelog(spark, 2000, seed=42, n_partitions=3).orderBy("seq").collect()
    assert a == b


def test_event_mix_properties(spark):
    n = 5000
    df = generate_changelog(spark, n, seed=42).cache()
    total = df.count()
    assert total == n + 2  # + add_column + rename_column

    # seq unique
    assert df.select("seq").distinct().count() == total

    # schema events present, mid-stream
    sops = df.where(F.col("op").isin("add_column", "rename_column")).collect()
    assert {r["op"] for r in sops} == {"add_column", "rename_column"}

    # duplicates by key exist (exact + LWW races)
    dups = (
        df.where(F.col("repo").isNotNull() & ~F.col("op").isin("add_column", "rename_column"))
        .groupBy("repo", "path", "commit")
        .count()
        .where("count > 1")
        .count()
    )
    assert dups > 0

    # hot repo skew ~50%
    hot = df.where(F.col("repo") == "org/hot-repo").count()
    assert 0.35 * n < hot < 0.65 * n

    # malformed rows exist (quarantine path)
    assert df.where(F.col("repo").isNull()).count() > 0

    # deletes exist
    assert df.where(F.col("op") == "delete").count() > 0

    # out-of-order seq: some rows have seq != "arrival order" neighbors
    rows = df.orderBy("ts").select("seq").limit(50).collect()
    seqs = [r["seq"] for r in rows]
    assert seqs != sorted(seqs)
    df.unpersist()


def test_write_wal_chunks(spark, tmp_path):
    df = generate_changelog(spark, 3000, seed=7)
    wal = str(tmp_path / "wal")
    chunks = write_wal(df, wal, chunk_size=1000)
    assert chunks == [0, 1, 2, 3]
    back = spark.read.parquet(wal)
    assert back.count() == 3002
