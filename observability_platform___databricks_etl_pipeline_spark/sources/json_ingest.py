"""Raw JSONL ingestion edge → WAL chunks (S1/S8/S13 parity).

Reference semantics: fixed-schema PERMISSIVE JSON scan with
``columnNameOfCorruptRecord`` (``01_ingest_raw_logs.py:110-116``), corrupt
rows counted and dropped (``:132-145``). Here corrupt rows are *kept*: they
flow into the WAL with null keys, which routes them to the engine's
quarantine table — nothing is silently dropped.

This is the producer-side adapter for deployments whose change feed arrives
as JSON lines rather than Parquet; it normalizes to the changelog schema and
writes seq-chunked WAL segments the replay engine consumes unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from observability_platform___databricks_etl_pipeline_spark.sources.wal import CHANGELOG_SCHEMA

# the JSON wire schema: changelog fields as strings + corrupt-record capture
_WIRE = StructType(
    [StructField(f.name, StringType() if f.name != "props" else f.dataType, True) for f in CHANGELOG_SCHEMA]
    + [StructField("_corrupt_record", StringType(), True)]
)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """PERMISSIVE fixed-schema JSONL scan → changelog-typed DataFrame.

    Corrupt lines (unparseable JSON) surface as rows whose key fields are
    null and whose ``props`` carries the raw line under ``_corrupt`` — the
    quarantine path picks them up downstream.
    """
    raw = (
        spark.read.schema(_WIRE)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    corrupt = F.col("_corrupt_record").isNotNull()
    return raw.select(
        F.col("seq").cast("long").alias("seq"),
        F.to_timestamp("ts").alias("ts"),
        F.when(corrupt, F.lit(None).cast("string")).otherwise(F.col("repo")).alias("repo"),
        F.col("path"),
        F.col("commit"),
        F.col("op"),
        F.col("lang"),
        F.col("content"),
        F.when(
            corrupt, F.create_map(F.lit("_corrupt"), F.col("_corrupt_record"))
        )
        .otherwise(F.col("props"))
        .alias("props"),
    )


def jsonl_to_wal(spark: SparkSession, json_path: str, wal_dir: str, chunk_size: int = 100_000) -> list[int]:
    """Normalize a JSONL drop into seq-chunked WAL segments."""
    from observability_platform___databricks_etl_pipeline_spark.gen.changelog import write_wal

    return write_wal(read_jsonl(spark, json_path), wal_dir, chunk_size=chunk_size)


def parse_kv_body(df: DataFrame, value_col: str = "value", out_col: str = "props") -> DataFrame:
    """Message-bus body parse: a JSON-object payload column → typed
    ``MAP<STRING,STRING>`` (the reference's Kafka/Event Hub body parse,
    ``from_json(value, 'MAP<STRING,STRING>')`` at
    ``00_ingest_from_log_hub.py:101,430``). Unparseable bodies yield a null
    map — callers route them to quarantine like any malformed event."""
    return df.withColumn(out_col, F.from_json(F.col(value_col), "MAP<STRING,STRING>"))
