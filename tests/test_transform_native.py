"""Native-expression transform == fused pandas-UDF transform (r6).

The replay hot path now runs classify + sanitize + lang-infer as native
whole-stage-codegen expressions (guide §4.1); these tests pin bit-for-bit
equivalence with the pandas kernels over (a) the deterministic WAL generator's
full event mix (redactable secrets, deletes, null ops/langs, malformed rows)
and (b) the sf0.001 documents corpus the flagship replays, plus (c) an
end-to-end replay A/B: CDC_TRANSFORM=native and =pandas must produce an
identical final table.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from observability_platform___databricks_etl_pipeline_spark.functions.classify import (
    classify_op_expr,
)
from observability_platform___databricks_etl_pipeline_spark.functions.langinfer import (
    infer_lang_expr,
)
from observability_platform___databricks_etl_pipeline_spark.functions.sanitize import (
    sanitize_guarded_expr,
)
from observability_platform___databricks_etl_pipeline_spark.functions.transform import (
    transform_udf,
)

SF0001 = "/root/testdata/sf0.001"


def _native_struct(op, path, content):
    out_op = classify_op_expr(op, content)
    san = F.when(out_op != "delete", sanitize_guarded_expr(content))
    lang = infer_lang_expr(path, san)
    return F.struct(out_op.alias("op"), san.alias("content"), lang.alias("lang"))


def _compare(df):
    both = df.select(
        "op",
        "path",
        "content",
        transform_udf(F.col("op"), F.col("path"), F.col("content")).alias("p"),
        _native_struct(F.col("op"), F.col("path"), F.col("content")).alias("n"),
    )
    diff = both.where(
        ~(F.col("p.op").eqNullSafe(F.col("n.op")))
        | ~(F.col("p.content").eqNullSafe(F.col("n.content")))
        | ~(F.col("p.lang").eqNullSafe(F.col("n.lang")))
    )
    rows = diff.limit(5).collect()
    assert not rows, f"native transform diverges from pandas kernels: {rows}"


def test_generator_mix_equivalence(spark):
    from observability_platform___databricks_etl_pipeline_spark.gen.changelog import (
        generate_changelog,
    )

    df = generate_changelog(spark, 20_000, n_repos=10, n_paths=50)
    _compare(df.select("op", "path", "content"))


def test_documents_corpus_equivalence(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    df = docs.select(
        F.lit("insert").alias("op"),
        F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        F.col("text").alias("content"),
    )
    _compare(df)


def test_edge_cases_equivalence(spark):
    rows = [
        (None, "a.py", None),                       # null op + null content -> delete
        (None, "a.py", "x"),                        # null op + content -> update
        ("RM", "b.unknownext", "text the thing"),   # alias, unmapped ext
        ("create", "noext", "#!/bin/sh\necho hi"),  # shebang rule
        ("m", "f.weird", "import os\nrest"),        # python rule
        ("update", "f.qqq", "fn main() -> i32 {"),  # rust rule
        ("u", "g.zzz", "func handler(w) {"),        # go rule
        ("delete", "x.py", "content anyway"),       # delete masks content
        ("i", "p.md", "mail me a@b.co password: hunter2 Bearer abcdefgh1234"),
        ("i", "p.md", "4111 1111 1111 1111 and 10.0.0.7"),
        ("weird-op", "p.sql", ""),                  # empty content -> update
    ]
    df = spark.createDataFrame(rows, "op string, path string, content string")
    _compare(df)


def test_replay_ab_native_vs_pandas(spark, tmp_path):
    from observability_platform___databricks_etl_pipeline_spark.gen.changelog import (
        generate_changelog,
        write_wal,
    )
    from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine

    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 12_000, n_repos=5, n_paths=40), wal, chunk_size=4_000)
    outs = {}
    for mode in ("native", "pandas"):
        os.environ["CDC_TRANSFORM"] = mode
        try:
            eng = CDCEngine(spark, str(tmp_path / f"tbl-{mode}"), n_buckets=4, with_rollup=False)
            eng.replay(wal)
            outs[mode] = sorted(
                tuple(r) for r in eng.vault.scan().drop("__bucket").collect()
            )
        finally:
            os.environ.pop("CDC_TRANSFORM", None)
    assert outs["native"] == outs["pandas"]
