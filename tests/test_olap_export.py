"""OLAP bulk export (S12 analog): DuckDB stands in for ClickHouse
(reference README.md:332-348)."""

import duckdb
import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.sinks import (
    export_parquet_handoff,
    export_stream,
)
from observability_platform___databricks_etl_pipeline_spark.sources.json_ingest import parse_kv_body


def test_export_parquet_handoff_roundtrip(spark, sf_dir, tmp_path):
    db = str(tmp_path / "olap.duckdb")
    gold = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )
    want = {(r["event_type"], r["n"], r["total"]) for r in gold.collect()}
    n = export_parquet_handoff(gold, db, "gold_rollup")
    assert n == len(want)
    con = duckdb.connect(db)
    got = {tuple(r) for r in con.execute("SELECT event_type, n, total FROM gold_rollup").fetchall()}
    assert got == want

    # append mode doubles the rows
    assert export_parquet_handoff(gold, db, "gold_rollup", mode="append") == 2 * len(want)


def test_export_stream_batched(spark, sf_dir, tmp_path):
    db = str(tmp_path / "olap2.duckdb")
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("k"), F.col("n_name").alias("name")
    )
    n = export_stream(dim, db, "nation_dim", batch_rows=7)  # force multiple batches
    con = duckdb.connect(db)
    assert n == con.execute("SELECT count(*) FROM nation_dim").fetchone()[0] == dim.count()
    assert con.execute("SELECT count(DISTINCT name) FROM nation_dim").fetchone()[0] == n


def test_parse_kv_body(spark):
    rows = [
        ('{"service":"api","level":"error"}',),
        ("not json at all",),
        (None,),
    ]
    df = parse_kv_body(spark.createDataFrame(rows, "value string"))
    got = [r["props"] for r in df.collect()]
    assert got[0] == {"service": "api", "level": "error"}
    assert got[1] is None and got[2] is None
