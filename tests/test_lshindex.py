"""LakeVault-backed write-time LSH index (r4 verdict #5): transactional
builds, scan_changes-driven incremental refresh of affected sign-buckets
only, equivalence with the on-the-fly LSH path, and survival of expiry."""

import numpy as np
import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.operators.lshindex import LshVaultIndex
from observability_platform___databricks_etl_pipeline_spark.operators.similarity import lsh_topk
from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import LakeVault

DIM = 16
DDL = "vec_id long, embedding array<double>"


def _corpus_vault(spark, root, rows):
    v = LakeVault.create(
        spark, root, [("vec_id", "long"), ("embedding", "array<double>")],
        key_cols=("vec_id",), n_buckets=4,
    )
    _commit_rows(spark, v, rows, "c0")
    return v


def _commit_rows(spark, v, rows, batch_id, replace_buckets=None):
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
        add_write_dir=wd, replace_buckets=replace_buckets,
        batch_id=batch_id, manifest={"batch_id": batch_id},
    )


def _rows(m, ids=None):
    ids = range(len(m)) if ids is None else ids
    return [(int(i), [float(x) for x in m[j]]) for j, i in enumerate(ids)]


def test_vault_lsh_index_build_refresh_expire(spark, tmp_path):
    rng = np.random.RandomState(4)
    m = rng.standard_normal((300, DIM))
    corpus_root, index_root = str(tmp_path / "corpus"), str(tmp_path / "index")

    cv = _corpus_vault(spark, corpus_root, _rows(m))
    a = cv.current_snapshot_id()
    idx = LshVaultIndex.build(spark, index_root, cv.scan(), n_planes=6, seed=42)

    def assert_equivalent(tag):
        corpus_now = cv.scan()
        for qi in (3, 50, 299, 300, 301):
            rows_now = {r["vec_id"]: r["embedding"] for r in corpus_now.where(
                F.col("vec_id").isin([qi])).collect()}
            if qi not in rows_now:
                continue
            q = [float(x) for x in rows_now[qi]]
            got = [(r["vec_id"], r["cosine"]) for r in idx.topk(q, k=5, multiprobe_hamming=1).collect()]
            want = [(r["vec_id"], r["cosine"]) for r in
                    lsh_topk(corpus_now, q, k=5, n_planes=6, seed=42, multiprobe_hamming=1).collect()]
            assert got == want, f"{tag}: query {qi}: {got} != {want}"

    assert_equivalent("after build")

    # corpus mutation: vec 3 moves to a new direction (bucket likely flips),
    # vec 7 deleted (its bucket rewritten without it), vec 300/301 inserted
    new3 = [float(x) for x in rng.standard_normal(DIM)]
    b3 = spark.createDataFrame([(3, new3)], DDL).select(cv.bucket_expr().alias("b")).first()["b"]
    b7 = spark.createDataFrame([(7, [0.0] * DIM)], DDL).select(cv.bucket_expr().alias("b")).first()["b"]
    touched = sorted({b3, b7})
    survivors = [
        (r["vec_id"], list(r["embedding"]))
        for r in cv.scan(buckets=touched).collect()
        if r["vec_id"] not in (3, 7)
    ]
    inserts = _rows(rng.standard_normal((2, DIM)), ids=[300, 301])
    ins_in_touched = [
        r for r in inserts
        if spark.createDataFrame([r], DDL).select(cv.bucket_expr().alias("b")).first()["b"] in touched
    ]
    ins_rest = [r for r in inserts if r not in ins_in_touched]
    b = _commit_rows(
        spark, cv, survivors + [(3, new3)] + ins_in_touched, "c1", replace_buckets=touched
    )
    if ins_rest:
        b = _commit_rows(spark, cv, ins_rest, "c2")

    # refresh from the corpus table's own change feed
    feed = cv.scan_changes(a, b)
    kinds = {r["vec_id"]: r["_change_type"] for r in feed.collect()}
    assert kinds[3] == "update" and kinds[7] == "delete"
    assert kinds[300] == kinds[301] == "insert"

    pre_refs = {r["path"]: r for r in idx.vault.snapshot().manifest_refs}
    affected = idx.refresh(feed)
    assert affected  # something moved
    # unaffected sign-buckets carried by manifest REFERENCE (path-identical)
    post_refs = {r["path"]: r for r in idx.vault.snapshot().manifest_refs}
    carried = [p for p, r in post_refs.items() if r["bucket"] not in affected]
    assert carried and all(p in pre_refs for p in carried)

    # deleted id fully gone from the index
    assert idx.vault.scan().where(F.col("vec_id") == 7).count() == 0
    assert_equivalent("after refresh")

    # batch path agrees with per-query path on the refreshed index
    corpus_now = cv.scan()
    qrows = [(int(r["vec_id"]), list(r["embedding"]))
             for r in corpus_now.where(F.col("vec_id").isin([3, 300])).collect()]
    queries = spark.createDataFrame(qrows, "qid long, qvec array<double>")
    batch = idx.topk_batch(queries, k=5)
    for qid, qv in qrows:
        got = [(r["vec_id"], r["cosine"]) for r in
               batch.where(F.col("qid") == qid).orderBy(F.col("cosine").desc(), "vec_id").collect()]
        want = [(r["vec_id"], r["cosine"]) for r in idx.topk(list(qv), k=5).collect()]
        assert got == want

    # retention applies to the index like any LakeVault table
    removed = idx.vault.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    assert removed
    assert_equivalent("after expiry")


def test_vault_lsh_index_rejects_murmur_ops(spark, tmp_path):
    """The index's physical bucket is the SIGN bucket; murmur3-keyed
    LakeVault operations must refuse it loudly."""
    import pytest

    rng = np.random.RandomState(1)
    corpus = spark.createDataFrame(_rows(rng.standard_normal((50, DIM))), DDL)
    idx = LshVaultIndex.build(spark, str(tmp_path / "idx"), corpus, n_planes=4)
    with pytest.raises(ValueError, match="bucket_fn"):
        idx.vault.bucket_expr()


def test_vault_lsh_index_rebuild_plane_count_is_pinned(spark, tmp_path):
    """The sign-bucket count (2^n_planes) is the table's physical bucket
    count, fixed at creation: a rebuild over the same root with a different
    n_planes must refuse loudly (misaligned sign vs manifest buckets), while
    a same-plane rebuild stays a plain atomic replace."""
    import pytest

    rng = np.random.RandomState(7)
    corpus = spark.createDataFrame(_rows(rng.standard_normal((40, DIM))), DDL)
    root = str(tmp_path / "idx")
    LshVaultIndex.build(spark, root, corpus, n_planes=4)
    with pytest.raises(ValueError, match="misalign"):
        LshVaultIndex.build(spark, root, corpus, n_planes=5)
    # same plane count: rebuild succeeds and stays query-equivalent
    idx = LshVaultIndex.build(spark, root, corpus, n_planes=4)
    q = [float(x) for x in rng.standard_normal(DIM)]
    got = [(r["vec_id"], r["cosine"]) for r in idx.topk(q, k=3).collect()]
    want = [
        (r["vec_id"], r["cosine"])
        for r in lsh_topk(corpus, q, k=3, n_planes=4).collect()
    ]
    assert got == want
