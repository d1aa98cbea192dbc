"""Parquet-native bloom filters: hash/footer-parse units + engine pruning.

The ``commit`` column is a hex hash — min/max stats span everything, so
bloom filters are the ONLY skipping that works for point probes on it
(reference's pruning story is min/max-only: 04_hive_sql_analysis.py:236-273).
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from observability_platform___databricks_etl_pipeline_spark.gen import generate_changelog, write_wal
from observability_platform___databricks_etl_pipeline_spark.plans import CDCEngine
from observability_platform___databricks_etl_pipeline_spark.plans.bloom import (
    bloom_offsets,
    file_may_contain,
    xxhash64,
)

ABSENT = "00deadbeef00deadbeef00deadbeef00deadbeef"


def test_xxhash64_reference_vectors():
    # public XXH64 test vectors, seed 0
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    # exercise every length class: 32+ lanes, 8/4/1-byte tails
    for n in (1, 3, 4, 7, 8, 12, 31, 32, 33, 64, 100):
        assert 0 <= xxhash64(bytes(range(256))[:n]) <= (1 << 64) - 1


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloomtbl"))
    wal = os.path.join(root, "wal")
    tbl = os.path.join(root, "tbl")
    write_wal(generate_changelog(spark, 2500, seed=17), wal, chunk_size=1250)
    eng = CDCEngine(spark, tbl, n_buckets=4, bloom_cols=["commit"])
    eng.replay(wal)
    return eng


def test_data_files_carry_blooms_on_configured_column_only(bloom_table):
    snap = bloom_table.vault.snapshot()
    files = [os.path.join(bloom_table.root, f["path"]) for f in snap.files]
    assert files
    for full in files:
        offs = bloom_offsets(full)
        assert "commit" in offs, full  # configured column has a bloom
        assert "repo" not in offs  # unconfigured columns don't


def test_membership_no_false_negatives(bloom_table):
    snap = bloom_table.vault.snapshot()
    full = os.path.join(bloom_table.root, snap.files[0]["path"])
    commits = pq.read_table(full, columns=["commit"]).column("commit").to_pylist()
    assert commits
    for v in commits:  # every present value must be maybe-present
        assert file_may_contain(full, "commit", v)
    # file without blooms: conservative keep
    assert file_may_contain(full, "no_such_column", "x")


def test_scan_prunes_absent_commit_to_zero_files(bloom_table):
    # scan applies NO row predicate — a 0-row result for an absent commit
    # is therefore proof the FILES were pruned, not the rows filtered
    assert bloom_table.vault.scan(column_equals={"commit": ABSENT}).count() == 0
    # and a present commit still reaches its row (superset guarantee)
    import pyspark.sql.functions as F

    one = bloom_table.current_state().limit(1).collect()[0]
    hits = (
        bloom_table.current_state(column_equals={"commit": one.commit})
        .where(F.col("commit") == one.commit)
        .collect()
    )
    assert any(r.repo == one.repo and r.path == one.path for r in hits)


def test_bloom_pruning_disabled_while_mor_deltas_live(spark, tmp_path):
    wal = str(tmp_path / "wal")
    tbl = str(tmp_path / "tbl")
    write_wal(generate_changelog(spark, 2000, seed=19), wal, chunk_size=500)
    eng = CDCEngine(
        spark, tbl, n_buckets=4, bloom_cols=["commit"], write_mode="mor",
        mor_compact_threshold=0,  # keep deltas alive
    )
    eng.replay(wal)
    snap = eng.vault.snapshot()
    assert any(f.get("delta") for f in snap.files), "test needs live deltas"
    # pruning must be OFF: the absent probe keeps every file (scan returns
    # the full merged row set, proving no file was dropped)
    n_all = eng.vault.scan().count()
    assert eng.vault.scan(column_equals={"commit": ABSENT}).count() == n_all
    # after compaction the deltas fold away and pruning turns back on
    eng.vault.compact()
    assert eng.vault.scan(column_equals={"commit": ABSENT}).count() == 0


def test_bloom_parity_with_bloomless_table(spark, tmp_path):
    """Same WAL, bloom on vs off → identical final state (blooms are
    physical-only metadata)."""
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 2000, seed=23), wal, chunk_size=1000)
    a = CDCEngine(spark, str(tmp_path / "a"), n_buckets=4, bloom_cols=["commit"])
    b = CDCEngine(spark, str(tmp_path / "b"), n_buckets=4)
    a.replay(wal)
    b.replay(wal)
    key = lambda eng: sorted(
        (r.repo, r.path, r.commit, r.last_seq)
        for r in eng.current_state().select("repo", "path", "commit", "last_seq").collect()
    )
    assert key(a) == key(b)
    # bloomless table files really have no blooms (option scoping works)
    for f in b.vault.snapshot().files:
        assert bloom_offsets(os.path.join(b.root, f["path"])) == {}


def test_typed_probe_encoding_matches_physical_width(spark, tmp_path):
    """Blooms hash the column's PHYSICAL plain encoding: INT32/FLOAT values
    are 4 bytes on disk, INT64/DOUBLE are 8. Probing at the declared width
    must never false-negative; probing an INT32 bloom at 8 bytes (the old
    behavior for every Python int) wrongly prunes files that DO hold the
    value — the exact bug the typed encoding fixed."""
    p = str(tmp_path / "t")
    df = spark.range(200).selectExpr(
        "cast(id as int) i32", "id i64",
        "cast(id as float) f32", "cast(id as double) f64",
    )
    w = df.coalesce(1).write.mode("overwrite")
    for c in ("i32", "i64", "f32", "f64"):
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
    w.parquet(p)
    f = glob.glob(os.path.join(p, "*.parquet"))[0]
    present = list(range(0, 200, 7))
    for v in present:  # no false negatives at the physical width
        assert file_may_contain(f, "i32", v, col_type="int")
        assert file_may_contain(f, "i64", v, col_type="long")
        assert file_may_contain(f, "f32", float(v), col_type="float")
        assert file_may_contain(f, "f64", float(v), col_type="double")
    # absent values prune at every width
    assert not file_may_contain(f, "i32", 10**6, col_type="int")
    assert not file_may_contain(f, "i64", 10**6, col_type="long")
    assert not file_may_contain(f, "f32", 1e6, col_type="float")
    assert not file_may_contain(f, "f64", 1e6, col_type="double")
    # the wrong width is NOT a safe fallback: 8-byte probes of the INT32
    # bloom miss (nearly) every present value
    assert not all(file_may_contain(f, "i32", v, col_type="long") for v in present)
    # unknown type for a numeric probe: conservative keep, never prune
    assert file_may_contain(f, "i32", 10**6)


def test_scan_probe_uses_per_file_schema_width_across_promotion(spark, tmp_path):
    """int→long promotion: files written before the promotion carry INT32
    physical encoding, files after INT64. scan(column_equals=...) must hash
    4 bytes against old-era files and 8 against new-era ones — one shared
    width would silently prune the era that really holds the row."""
    from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import LakeVault

    root = str(tmp_path / "tbl")
    v = LakeVault.create(
        spark, root,
        [("repo", "string"), ("path", "string"), ("val", "int"), ("last_seq", "long")],
        key_cols=("repo", "path"), n_buckets=2, bloom_cols=["val"],
    )

    def _commit(df, batch_id, new_schema=None):
        wd = v.new_write_dir(batch_id)
        wr = df.withColumn("__bucket", v.bucket_expr()).repartition(1, "__bucket").write
        for k, val in v.data_write_options().items():
            wr = wr.option(k, val)
        wr.mode("overwrite").partitionBy("__bucket").parquet(wd)
        v.commit(add_write_dir=wd, replace_buckets=[], batch_id=batch_id,
                 manifest={"batch_id": batch_id}, new_schema=new_schema)

    _commit(
        spark.createDataFrame([("r1", "a.py", 111, 1), ("r1", "b.py", 222, 2)],
                              "repo string, path string, val int, last_seq long"),
        "era-int",
    )
    _commit(
        spark.createDataFrame([("r2", "c.py", 333, 3), ("r2", "d.py", 444, 4)],
                              "repo string, path string, val long, last_seq long"),
        "era-long",
        new_schema=v.snapshot().schema.promote_column("val", "long"),
    )
    # both eras' values survive the bloom-pruned scan (probe matches each
    # file's own physical width)
    assert v.scan(column_equals={"val": 111}).where("val = 111").count() == 1
    assert v.scan(column_equals={"val": 444}).where("val = 444").count() == 1
    # absent value prunes every file in both eras
    assert v.scan(column_equals={"val": 9999}).count() == 0
