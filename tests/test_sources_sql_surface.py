"""S1 JSONL-edge parity + S14/§3.2 SQL-surface parity tests."""

import json

import pyspark.sql.functions as F

from observability_platform___databricks_etl_pipeline_spark.gen.changelog import generate_changelog, write_wal
from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine
from observability_platform___databricks_etl_pipeline_spark.sources.json_ingest import jsonl_to_wal, read_jsonl


def test_jsonl_permissive_ingest(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    rows = [
        {"seq": 1, "ts": "2024-01-01 00:00:00", "repo": "r", "path": "a.py",
         "commit": "c1", "op": "insert", "lang": None, "content": "x = 1", "props": {"k": "1"}},
        {"seq": 2, "ts": "2024-01-01 00:00:01", "repo": "r", "path": "a.py",
         "commit": "c2", "op": "update", "lang": "python", "content": "x = 2", "props": None},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("{this is not json\n")  # corrupt line → quarantine path

    df = read_jsonl(spark, str(p))
    got = df.orderBy(F.col("seq").asc_nulls_last()).collect()
    assert got[0]["seq"] == 1 and got[0]["content"] == "x = 1"
    assert got[1]["lang"] == "python"
    corrupt = [r for r in got if r["repo"] is None]
    assert len(corrupt) == 1 and "_corrupt" in (corrupt[0]["props"] or {})

    # end-to-end: JSONL → WAL → engine, corrupt row lands in quarantine
    wal = str(tmp_path / "wal")
    jsonl_to_wal(spark, str(p), wal, chunk_size=100)
    eng = CDCEngine(spark, str(tmp_path / "tbl"), n_buckets=4)
    res = eng.replay(wal)
    assert sum(b.quarantined for b in res.batches) == 1
    state = {r["path"]: r["content"] for r in eng.current_state().collect()}
    assert state == {"a.py": "x = 2"}  # LWW winner


def test_sql_surface_over_snapshot(spark, tmp_path):
    """§3.2/S14: the final-state table is queryable through plain Spark SQL
    (temp view over the snapshot scan) and matches the DataFrame entry point."""
    wal = str(tmp_path / "wal")
    write_wal(generate_changelog(spark, 2000, seed=9), wal, chunk_size=1000)
    eng = CDCEngine(spark, str(tmp_path / "tbl"), n_buckets=4)
    eng.replay(wal)
    eng.current_state().createOrReplaceTempView("source_files")

    sql = spark.sql(
        "SELECT lang, count(*) AS n FROM source_files GROUP BY lang ORDER BY n DESC, lang"
    ).collect()
    dfv = (
        eng.current_state()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "lang")
        .collect()
    )
    assert sql == dfv and len(sql) > 3

    # time travel through SQL as well (S4): first snapshot ≠ current
    first_data_snap = eng.vault.snapshot_ids()[1]
    eng.vault.scan(snapshot_id=first_data_snap).createOrReplaceTempView("source_files_v1")
    n_v1 = spark.sql("SELECT count(*) n FROM source_files_v1").collect()[0]["n"]
    n_now = spark.sql("SELECT count(*) n FROM source_files").collect()[0]["n"]
    assert n_v1 <= n_now and n_v1 > 0
