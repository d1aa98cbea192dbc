"""Training-data dedup family + LWW operator unit tests."""

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.operators.dedup import (
    exact_dedup,
    lww_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_candidates,
)


def test_lww_dedup_deterministic_winner(spark):
    rows = [
        ("r", "p", "c1", 5, "a"),
        ("r", "p", "c1", 7, "b"),   # winner by seq
        ("r", "p", "c1", 7, "a"),   # same seq: tie-break on content desc
        ("r", "q", "c2", 1, "x"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, seq long, content string")
    out = lww_dedup(df, ["repo", "path", "commit"], ["seq", "content"], count_col="n")
    got = {(r["repo"], r["path"], r["commit"]): (r["seq"], r["content"], r["n"]) for r in out.collect()}
    assert got[("r", "p", "c1")] == (7, "b", 3)
    assert got[("r", "q", "c2")] == (1, "x", 1)


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2, "the quick brown fox jumps over the lazy dog and runs far away house"),  # near-dup of 1
    (3, "completely different content about spark query engines and shuffles"),
    (4, "the quick brown fox jumps over the lazy dog and runs far away home"),  # exact dup of 1
    (5, "yet another unrelated document mentioning lakes vaults and snapshots"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id").collect()
    by_id = {r["doc_id"]: r["n_copies"] for r in out}
    assert by_id[1] == 2          # docs 1+4 collapse, min id kept
    assert 4 not in by_id
    assert by_id[2] == 1


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_candidates(_docs(spark), num_hashes=32, bands=16, k=3).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0   # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5    # near dup
    assert (1, 3) not in pairs and (3, 5) not in pairs


def test_simhash_candidates(spark):
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_candidates(_docs(spark), max_hamming=6).collect()}
    assert got.get((1, 4)) == 0          # identical text → identical simhash
    assert (1, 2) in got                 # near dup within hamming 6
    assert (1, 3) not in got and (1, 5) not in got


def test_simhash_recall_matches_brute_force(spark):
    """Round-1 regression: blocking must have GUARANTEED recall at the
    requested distance. Brute-force all-pairs hamming over the simhash table
    is ground truth; the blocked operator must return exactly the pairs at
    hamming <= max_hamming — including distances 4-6, which the old fixed
    4x16-bit chunking silently missed."""
    import itertools

    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import simhash_table

    base = "the quick brown fox jumps over the lazy dog near the river bank today".split()
    docs = []
    for i in range(30):
        w = list(base)
        # deterministic word swaps → a spread of hamming distances
        for j in range(i % 7):
            w[(i + j * 3) % len(w)] = f"tok{i}_{j}"
        docs.append((i, " ".join(w)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sh = {r["id"]: r["sh"] for r in simhash_table(df, "text", "doc_id").collect()}
    for max_h in (3, 6):
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(sh), 2)
            if bin(sh[a] ^ sh[b]).count("1") <= max_h
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_candidates(df, "text", "doc_id", max_hamming=max_h).collect()
        }
        assert got == want, f"max_hamming={max_h}: missed {want - got}, extra {got - want}"
    # the corpus must actually exercise the 4..6 band (else this test is vacuous)
    dists = sorted(bin(sh[a] ^ sh[b]).count("1") for a, b in itertools.combinations(sorted(sh), 2))
    assert any(4 <= d <= 6 for d in dists), dists[:20]


def test_df_cap_drops_stop_shingles(spark):
    """A stop-shingle in 50%+ of docs is the O(d^2) scale-killer; df_cap must
    remove it from the join. Docs share ONLY the hot phrase, so with the cap
    no candidate pairs survive."""
    hot = "all your base are belong to us"
    docs = [(i, f"{hot} unique{i} words{i} here{i} now{i}") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, n=3, threshold=0.01)
    assert uncapped.count() == 66  # all 12*11/2 pairs intersect via the hot phrase
    capped = ngram_jaccard_pairs(df, n=3, threshold=0.01, df_cap=6)
    assert capped.count() == 0

    # minhash signatures also honor the cap (hot shingles excluded)
    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import minhash_lsh_candidates

    assert minhash_lsh_candidates(df, num_hashes=16, bands=8, k=3, df_cap=6).count() == 0


def test_ngram_jaccard_pairs(spark):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.5).collect()
    }
    assert got.get((1, 4)) == 1.0
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1.0
    assert (1, 3) not in got


def test_connected_components_and_clusters(spark):
    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import (
        connected_components,
        dedup_clusters,
    )

    # chain 1-2-3 (diameter 2, needs >1 round), pair 5-6, singletons 4,7
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    cc = {r["id"]: r["cluster_id"] for r in connected_components(edges, nodes).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}

    df = nodes.select(F.col("id").alias("doc_id"))
    pairs = edges
    out = {r["doc_id"]: r for r in dedup_clusters(df, pairs, "doc_id").collect()}
    assert len(out) == 7
    assert out[3]["cluster_id"] == 1 and out[3]["cluster_size"] == 3
    assert out[1]["is_canonical"] and not out[2]["is_canonical"]
    assert out[4]["cluster_size"] == 1 and out[4]["is_canonical"]
    # canonical survivors = one per cluster
    assert sum(1 for r in out.values() if r["is_canonical"]) == 4


def test_connected_components_long_chain_converges(spark):
    """Pointer jumping: a 60-node chain (diameter 59) must converge within
    the default max_iter=25 — plain one-hop propagation would need 59."""
    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 60)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 61)], "id long")
    cc = connected_components(edges, nodes)
    assert {r["cluster_id"] for r in cc.collect()} == {1}


def test_connected_components_matches_union_find(spark):
    """Random graph vs a driver-side union-find reference."""
    import hashlib

    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import connected_components

    n = 200
    edges = []
    for i in range(150):  # deterministic pseudo-random edges
        h = hashlib.md5(f"edge:{i}".encode()).hexdigest()
        a, b = int(h[:8], 16) % n, int(h[8:16], 16) % n
        if a != b:
            edges.append((a, b))

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id in component
    comp = {}
    for x in range(n):
        comp.setdefault(find(x), []).append(x)
    want = {x: min(m) for m in comp.values() for x in m}

    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            spark.createDataFrame(edges, "id_a long, id_b long"),
            spark.createDataFrame([(i,) for i in range(n)], "id long"),
        ).collect()
    }
    assert got == want


def test_incremental_jaccard_pairs(spark):
    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import incremental_jaccard_pairs

    corpus = spark.createDataFrame(
        [
            (2, "the quick brown fox jumps over the lazy dog at home"),
            (4, "completely different corpus text about query engines"),
            (6, "the quick brown fox jumps over the lazy dog at home"),  # corpus-internal dup
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog at house"),  # near-dup of 2 and 6
            (3, "totally unrelated incoming document about parquet files"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental_jaccard_pairs(new, corpus, "text", "doc_id", n=3, threshold=0.3).collect()
    }
    assert (1, 2) in got and (1, 6) in got and got[(1, 2)] > 0.5
    # asymmetric: the corpus-internal pair (2,6) must NOT be reported
    assert all(k[0] in (1, 3) for k in got)
    assert (3, 4) not in got


def test_minhash_rejects_bad_band_config(spark):
    import pytest

    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands=16"):
        minhash_lsh_candidates(df, num_hashes=8, bands=16)  # would cross-join
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_candidates(df, num_hashes=32, bands=5)  # drops components
    with pytest.raises(ValueError, match="bands=0"):
        minhash_lsh_candidates(df, num_hashes=8, bands=0)


def test_lww_dedup_rejects_colliding_count_col(spark):
    import pytest

    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import lww_dedup

    df = spark.createDataFrame([("r", 1)], "repo string, seq long")
    with pytest.raises(ValueError, match="collides"):
        lww_dedup(df, ["repo"], ["seq"], count_col="seq")


def test_exact_dedup_ignores_null_text(spark):
    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_copies"] for r in exact_dedup(df).collect()}
    # the real duplicate pair collapses; null-text rows are never grouped
    assert out == {1: 2}


def test_ngram_oracle_parity_on_short_docs(spark):
    """Documents with fewer than n words produce one whole-text shingle in
    BOTH engines (the oracle CTE previously emitted zero shingles for them,
    silently dropping short docs from four gates)."""
    import duckdb
    import pandas as pd

    from observability_platform___databricks_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from observability_platform___databricks_etl_pipeline_spark.queries import _NGRAM_CTES

    rows = [(1, "hi there"), (2, "hi there"), (3, "one"), (4, "a much longer doc with words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        tuple(r)
        for r in con.execute(
            f"WITH {_NGRAM_CTES} SELECT id_a, id_b, jaccard FROM ngpairs WHERE jaccard >= 0.5"
        ).fetchall()
    }
    assert got == want
    assert (1, 2, 1.0) in got  # the 2-word twins are found
