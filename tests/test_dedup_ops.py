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


def test_ngram_jaccard_pairs(spark):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.5).collect()
    }
    assert got.get((1, 4)) == 1.0
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1.0
    assert (1, 3) not in got
