from observability_platform___databricks_etl_pipeline_spark.sinks.olap_export import (
    export_parquet_handoff,
    export_stream,
)

__all__ = ["export_parquet_handoff", "export_stream"]
