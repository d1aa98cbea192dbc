from observability_platform___databricks_etl_pipeline_spark.sources.wal import (
    CHANGELOG_SCHEMA,
    list_chunks,
    read_chunk,
    read_wal,
)

__all__ = ["CHANGELOG_SCHEMA", "list_chunks", "read_chunk", "read_wal"]
