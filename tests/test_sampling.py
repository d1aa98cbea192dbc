"""Deterministic stratified sampling: partition-invariance + rate accuracy."""

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.operators.sampling import stratified_sample

RATES = {"en": 0.25, "zh": 1.0}


def _corpus(spark):
    return spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("en"), F.lit("zh"), F.lit("fr")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_partition_invariant_membership(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in stratified_sample(df, "lang", RATES, 0.5, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(df.repartition(13), "lang", RATES, 0.5, "doc_id").collect()
    }
    assert a == b and a


def test_rates_hold_and_full_stratum_kept(spark):
    df = _corpus(spark)
    kept = stratified_sample(df, "lang", RATES, 0.5, "doc_id")
    n = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert n["zh"] == 1000                      # rate 1.0 keeps everything
    assert 400 <= n["en"] <= 600                # 2000 * 0.25 ± hash noise
    assert 400 <= n["fr"] <= 600                # 1000 * 0.5 (default rate)


def test_stratified_sample_sql_empty_rates_is_valid_sql(spark, sf_dir):
    """rates={} must yield a parseable oracle predicate (a CASE with no WHEN
    arms is a DuckDB parse error) that matches the Spark draw exactly."""
    import duckdb

    from observability_platform___databricks_etl_pipeline_spark.operators.sampling import (
        stratified_sample,
        stratified_sample_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "lang", {}, 0.25, "doc_id").select("doc_id").collect()
    )
    con = duckdb.connect()
    pred = stratified_sample_sql("lang", {}, 0.25, "doc_id")
    want = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') "
            f"WHERE {pred} ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want and got
