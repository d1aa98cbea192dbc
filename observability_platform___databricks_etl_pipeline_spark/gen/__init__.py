from observability_platform___databricks_etl_pipeline_spark.gen.changelog import (
    CHANGELOG_COLUMNS,
    generate_changelog,
    write_wal,
)

__all__ = ["CHANGELOG_COLUMNS", "generate_changelog", "write_wal"]
