"""Offset-chunked WAL source — the engine's only hot-path input.

Reference analogs: Kafka batch read with offset ranges
(``00_ingest_from_log_hub.py:415-420``) and fixed-schema PERMISSIVE JSON scan
(``01_ingest_raw_logs.py:110-116``). Here the WAL is a Parquet dataset
partitioned by ``chunk = seq // chunk_size``; a batch read is a
partition-pruned scan of one chunk directory (explicit schema, never
inferred on the hot path — SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHANGELOG_SCHEMA = StructType(
    [
        StructField("seq", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
        StructField("commit", StringType(), True),
        StructField("op", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
        StructField("props", MapType(StringType(), StringType()), True),
    ]
)

N_WAL_PARTITIONS = 8  # logical WAL partitions for per-partition offsets


def list_chunks(wal_dir: str) -> list[int]:
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(wal_dir)
        if d.startswith("chunk=") and d.split("=", 1)[1].lstrip("-").isdigit()
    )


def read_chunk(spark: SparkSession, wal_dir: str, chunk: int) -> DataFrame:
    """Scan exactly one offset chunk (partition-pruned; fixed schema)."""
    return spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{wal_dir}/chunk={chunk}")


def chunked_schema() -> StructType:
    """CHANGELOG_SCHEMA + the hive-partition `chunk` column, as a NEW struct
    (StructType.add mutates in place — never call it on the shared global)."""
    return StructType(list(CHANGELOG_SCHEMA.fields) + [StructField("chunk", LongType(), True)])


def read_wal(spark: SparkSession, wal_dir: str) -> DataFrame:
    """Scan the whole WAL (used by tests / full-replay oracle, not the loop)."""
    return spark.read.option("basePath", wal_dir).schema(chunked_schema()).parquet(wal_dir)


def wal_partition(repo_col: str = "repo") -> F.Column:
    """Logical WAL partition of an event (per-partition offset tracking)."""
    return F.pmod(F.xxhash64(F.coalesce(F.col(repo_col), F.lit(""))), F.lit(N_WAL_PARTITIONS))
