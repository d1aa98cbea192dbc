"""Property-based test: for ANY event sequence, engine replay state ==
sequential reducer state (hypothesis-generated key/seq/op/content patterns,
including adversarial duplicate seqs, interleaved deletes, resurrections)."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from observability_platform___databricks_etl_pipeline_spark.operators.dedup import lww_dedup

KEYS = [("r1", "a"), ("r1", "b"), ("r2", "a")]

event_st = st.tuples(
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=50),  # seq (collisions allowed!)
    st.sampled_from(["insert", "update", "delete"]),
    # min_size=1 so a non-delete's content never collides with a delete's
    # empty ordering key at equal seq (which would make the winner ambiguous
    # by specification, not by bug)
    st.text(alphabet="abcxyz", min_size=1, max_size=8),
)


def _reduce(events):
    """Sequential truth: winner per key = max (seq, coalesce(content, ''))."""
    best: dict = {}
    for (repo, path), seq, op, content in events:
        key = (repo, path)
        c = None if op == "delete" else content
        cand_order = (seq, c or "")
        if key not in best or cand_order > (best[key][0], best[key][3] or ""):
            best[key] = (seq, op, op == "delete", c)
    return {k: (v[0], v[3]) for k, v in best.items() if not v[2]}


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event_st, min_size=1, max_size=25))
def test_lww_dedup_matches_sequential_reducer(spark, events):
    rows = [
        (repo, path, seq, op, None if op == "delete" else content)
        for (repo, path), seq, op, content in events
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, seq long, op string, content string"
    )
    out = lww_dedup(
        df.withColumn("c2", df.content), ["repo", "path"], ["seq", "c2"]
    )
    got = {
        (r["repo"], r["path"]): (r["seq"], r["content"])
        for r in out.collect()
        if r["op"] != "delete"
    }
    want = _reduce(events)
    assert got == want


def test_lww_tiebreak_is_total_order(spark):
    """Same key, same seq, different content: winner is max content — stable
    across partitionings."""
    rows = [("r", "p", 1, "insert", c) for c in ["zzz", "aaa", "mmm"]]
    for parts in (1, 3):
        df = spark.createDataFrame(
            rows, "repo string, path string, seq long, op string, content string"
        ).repartition(parts)
        out = lww_dedup(df, ["repo", "path"], ["seq", "content"]).collect()
        assert out[0]["content"] == "zzz"


def test_sha_invariant_stability():
    """The content_sha256 invariant: sanitization is deterministic, so the
    sha of a sanitized content is reproducible across processes."""
    from observability_platform___databricks_etl_pipeline_spark.functions.sanitize import sanitize_series
    import pandas as pd

    s = pd.Series(["email me: x@y.co and Bearer abcdef123456 done"])
    a = hashlib.sha256(sanitize_series(s)[0].encode()).hexdigest()
    b = hashlib.sha256(sanitize_series(s.copy())[0].encode()).hexdigest()
    assert a == b
