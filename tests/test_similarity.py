"""ANN similarity search: brute force vs numpy oracle, LSH/IVF recall."""

import numpy as np
import pytest

from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_pandas,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
)

DIM = 16
N = 400


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(0)
    m = rng.standard_normal((N, DIM))
    m[7] = m[3] * 1.001 + 0.0001  # planted near-dup pair (3, 7)
    rows = [(int(i), [float(x) for x in m[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    df.count()
    return df, m


def _numpy_topk(m, q, k):
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(m)), -sims))
    return [int(i) for i in order[:k]]


def test_brute_force_matches_numpy(spark, vecs):
    df, m = vecs
    q = [float(x) for x in m[3]]
    got = [r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()]
    assert got == _numpy_topk(m, np.asarray(q), 10)
    got_p = [r["vec_id"] for r in brute_force_topk_pandas(df, q, k=10).collect()]
    assert got_p == got


def test_lsh_and_ivf_recall(spark, vecs):
    df, m = vecs
    q = [float(x) for x in m[3]]
    exact = set(_numpy_topk(m, np.asarray(q), 5))
    lsh = {r["vec_id"] for r in lsh_topk(df, q, k=5, n_planes=6).collect()}
    ivf = {r["vec_id"] for r in ivf_topk(df, q, k=5, n_centroids=4, n_probe=2).collect()}
    # approximate: require the planted near-dup + self in both, recall ≥ 2/5
    assert 3 in lsh and 7 in lsh
    assert len(exact & lsh) >= 2
    assert len(exact & ivf) >= 2


def test_embedding_neardup_pairs(spark, vecs):
    df, _ = vecs
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df, threshold=0.99).collect()}
    assert (3, 7) in pairs
    assert len(pairs) < 20  # not exploding into everything


def test_kmeans_fit_recovers_planted_clusters(spark):
    import hashlib

    import numpy as np

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit,
    )

    # 3 planted clusters at distant means, deterministic jitter
    means = np.array([[5.0] * 8, [-5.0] * 8, [0.0] * 8])
    rows = []
    for i in range(240):
        c = i % 3
        h = hashlib.md5(f"k{i}".encode()).digest()
        jit = (np.frombuffer(h[:8], dtype=np.uint8).astype("float64") - 127.5) / 255.0
        rows.append((i, (means[c] + jit).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = kmeans_fit(df, n_centroids=3, n_iter=8, seed=7)
    # each planted mean is within jitter range of some fitted centroid
    for m in means:
        assert min(np.abs(cents - m).max(axis=1)) < 0.5

    # IVF over the FITTED index: probing 1 cell returns the exact top-k
    q = (means[0] + 0.01).tolist()
    got = [r["vec_id"] for r in ivf_topk(df, q, k=5, n_probe=1, centroids=cents).collect()]
    want = [r["vec_id"] for r in brute_force_topk(df, q, 5).collect()]
    assert got == want


def test_lsh_write_time_index_prunes_and_matches(spark, sf_dir, tmp_path):
    """The write-time LSH index must (a) return exactly what the on-the-fly
    LSH path returns and (b) scan ONLY the probe buckets' partitions —
    PartitionFilters pushdown visible in the physical plan."""
    import pyspark.sql.functions as F

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
        build_lsh_index,
        lsh_index_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]

    idx = str(tmp_path / "lsh-index")
    build_lsh_index(emb, idx, n_planes=6)
    got = lsh_index_topk(spark, idx, query, k=10, n_planes=6)
    want = lsh_topk(emb, query, k=10, n_planes=6)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__b" in plan.split("PartitionFilters", 1)[1][:200]


def test_batch_topk_equals_per_query(spark, vecs):
    """lsh_topk_batch / ivf_topk_batch over a queries DataFrame must equal
    the single-query paths row-for-row per qid (same buckets/cells probed,
    same rounded cosines, same tie order)."""
    import pyspark.sql.functions as F

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
        ivf_topk_batch,
        lsh_topk_batch,
    )

    df, m = vecs
    qids = [3, 11, 42]
    queries = df.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    got_lsh = lsh_topk_batch(df, queries, k=5, n_planes=6)
    for qid in qids:
        q = [float(x) for x in m[qid]]
        want = [(r["vec_id"], r["cosine"]) for r in lsh_topk(df, q, k=5, n_planes=6).collect()]
        got = [
            (r["vec_id"], r["cosine"])
            for r in got_lsh.where(F.col("qid") == qid).orderBy(F.desc("cosine"), "vec_id").collect()
        ]
        assert got == want, f"lsh batch != single for qid={qid}"

    got_ivf = ivf_topk_batch(df, queries, k=5, n_centroids=4, n_probe=2)
    for qid in qids:
        q = [float(x) for x in m[qid]]
        want = [(r["vec_id"], r["cosine"]) for r in ivf_topk(df, q, k=5, n_centroids=4, n_probe=2).collect()]
        got = [
            (r["vec_id"], r["cosine"])
            for r in got_ivf.where(F.col("qid") == qid).orderBy(F.desc("cosine"), "vec_id").collect()
        ]
        assert got == want, f"ivf batch != single for qid={qid}"


def test_batch_index_topk_prunes_and_matches(spark, sf_dir, tmp_path):
    """lsh_index_topk_batch == lsh_topk_batch over the same corpus, with the
    probed buckets pushed as partition filters (scan never lists the rest)."""
    import pyspark.sql.functions as F

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
        build_lsh_index,
        lsh_index_topk_batch,
        lsh_topk_batch,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    idx = str(tmp_path / "lsh-index-b")
    build_lsh_index(emb, idx, n_planes=6)
    got = lsh_index_topk_batch(spark, idx, queries, k=10, n_planes=6)
    want = lsh_topk_batch(emb, queries, k=10, n_planes=6)
    assert sorted([tuple(r) for r in got.collect()], key=lambda t: (t[0], -t[2], t[1])) == \
           sorted([tuple(r) for r in want.collect()], key=lambda t: (t[0], -t[2], t[1]))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__b" in plan.split("PartitionFilters", 1)[1][:200]


def test_batch_topk_skips_null_and_ragged_queries(spark, vecs):
    """Null / wrong-length query vectors are dropped, not job failures —
    the remaining queries still return their exact per-query results; an
    EMPTY corpus yields an empty frame (dim comes from the queries side)."""
    import pyspark.sql.functions as F

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
        ivf_topk_batch,
        lsh_topk_batch,
    )

    df, m = vecs
    good = df.where(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    bad = spark.createDataFrame(
        [(9001, None), (9002, [1.0, 2.0])], "qid long, qvec array<double>"
    )
    queries = good.unionByName(bad)
    got = lsh_topk_batch(df, queries, k=5, n_planes=6)
    qids = {r["qid"] for r in got.collect()}
    assert qids == {3}
    got_ivf = ivf_topk_batch(df, queries, k=5, n_centroids=4, n_probe=2)
    assert {r["qid"] for r in got_ivf.collect()} == {3}

    empty = df.where(F.lit(False))
    assert lsh_topk_batch(empty, queries, k=5, n_planes=6).count() == 0


def test_incremental_embedding_neardup_asymmetric(spark, vecs):
    """Only (new, corpus) pairs come back — corpus-internal near-dups (the
    planted 3/7 twins) and batch-internal pairs are out of scope; null /
    ragged new vectors are skipped, not job failures."""
    import pyspark.sql.functions as F

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
        incremental_embedding_neardup,
    )

    df, m = vecs  # corpus contains the (3, 7) near-dup pair
    # new batch: an exact copy of corpus vec 11 (id 9011), a copy of vec 3
    # (id 9003), a null vector, and a ragged one
    rows = [
        (9011, [float(x) for x in m[11]]),
        (9003, [float(x) for x in m[3]]),
        (9500, None),
        (9501, [1.0, 2.0]),
    ]
    new = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_embedding_neardup(new, df, threshold=0.999).collect()
    }
    assert (9011, 11) in got
    assert (9003, 3) in got and (9003, 7) in got  # 3's twin 7 also matches
    assert all(n >= 9000 for n, _c in got)        # never corpus-internal
    assert all(c < 9000 for _n, c in got)         # never batch-internal


def test_ivf_assign_arrow_matches_literal(spark, vecs):
    """r4 verdict #2: the Arrow matmul+argmin assignment must equal the
    literal-tree argmin row-for-row on a seeded corpus, the small-k path
    must stay pure-JVM (no Python in the plan — it is the SQL-oracle-
    reproducible reference), and the auto-routing must flip on the k x dim
    literal budget."""
    import numpy as np

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
        _IVF_LITERAL_MAX_TERMS,
        ivf_assign,
    )

    df, m = vecs
    rng = np.random.RandomState(3)
    cents = rng.standard_normal((6, m.shape[1]))

    lit = ivf_assign(df, cents, use_arrow=False)
    arw = ivf_assign(df, cents, use_arrow=True)
    lit_map = {r["vec_id"]: r["centroid"] for r in lit.collect()}
    arw_map = {r["vec_id"]: r["centroid"] for r in arw.collect()}
    assert lit_map == arw_map and len(lit_map) == df.count()

    # physical strategies: literal path pure JVM, arrow path ArrowEval
    lit_plan = lit._jdf.queryExecution().executedPlan().toString()
    arw_plan = arw._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in lit_plan
    assert "ArrowEvalPython" in arw_plan

    # auto-routing: 6 x 16 = 96 terms <= budget -> literal (no Python)
    assert 6 * m.shape[1] <= _IVF_LITERAL_MAX_TERMS
    auto_plan = ivf_assign(df, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in auto_plan
    # a wide centroid matrix must route to Arrow (never reach the planner
    # as a literal tree)
    wide = rng.standard_normal((_IVF_LITERAL_MAX_TERMS // m.shape[1] + 1, m.shape[1]))
    wide_plan = ivf_assign(df, wide)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in wide_plan


def test_kmeans_arrow_means_match_avg(spark, vecs):
    """The Arrow partial-sum recompute (the >1k-dim path) must converge to
    the same centroids as the avg-column recompute — same seed, same
    assignments, means differing only by float association (~1e-12)."""
    import numpy as np

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import kmeans_fit

    df, _ = vecs
    c_avg = kmeans_fit(df, n_centroids=3, n_iter=4, seed=7, use_arrow_means=False)
    c_arw = kmeans_fit(df, n_centroids=3, n_iter=4, seed=7, use_arrow_means=True)
    assert np.allclose(c_avg, c_arw, atol=1e-9)


def test_dim768_blas_default_matches_fold(spark):
    """r4 verdict #4: above _UNROLL_MAX_DIM the dot/norm route to the Arrow
    BLAS path by default. At dim 768 the BLAS and fold scores agree to well
    inside the round-to-6 contract (association gap ~1e-14), and
    brute_force_topk returns the numpy-exact ranking."""
    import numpy as np
    import pyspark.sql.functions as F

    from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
        _UNROLL_MAX_DIM,
        _dot,
        _dot_dim,
        _norm_dim,
        brute_force_topk,
    )

    dim, n = 768, 60
    assert dim > _UNROLL_MAX_DIM
    rng = np.random.RandomState(11)
    m = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in m[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()

    # routed column vs interpreted fold: same values inside 1e-9
    v = F.col("embedding")
    both = df.select(
        _dot_dim(v, v, dim).alias("blas"),
        _dot(v, v).alias("fold"),
        _norm_dim(v, dim).alias("nblas"),
    ).collect()
    for r in both:
        assert abs(r["blas"] - r["fold"]) <= 1e-9 * max(1.0, abs(r["fold"]))
        assert abs(r["nblas"] - r["fold"] ** 0.5) <= 1e-9 * max(1.0, abs(r["fold"]))

    # the routed plan is Arrow, not a 768-term codegen tree
    plan = df.select(_dot_dim(v, v, dim).alias("d"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan

    # end-to-end: top-k at 768 dims matches the numpy oracle
    q = [float(x) for x in m[5]]
    got = [r["vec_id"] for r in brute_force_topk(df, q, k=8).collect()]
    assert got == _numpy_topk(m, np.asarray(q), 8)
