"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-imagining of the reference Databricks medallion ETL
(``espirado/Observability-Platform---Databricks-ETL-Pipeline``) as a reusable
change-event processor: it tails a WAL-style change log of source-code
repository events ``(seq, ts, repo, path, commit, op, lang, content, props)``,
deduplicates by ``(repo, path, commit)`` with deterministic last-writer-wins,
runs all row transforms as vectorized pandas/Arrow UDFs, and applies
key-partitioned MERGE/upsert into copy-on-write snapshot tables ("LakeVault",
an Iceberg-shaped Parquet + JSON-manifest format) with schema evolution,
exactly-once commit manifests and checkpointed per-partition offsets.

Reference parity map lives in SURVEY.md §2; every module cites the reference
sites (file:line under /root/reference) whose *semantics* it re-expresses.
Nothing is ported: the reference is notebook-driven Delta/Databricks; this
engine is plain PySpark DataFrame code over a self-owned table format.
"""

from observability_platform___databricks_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
