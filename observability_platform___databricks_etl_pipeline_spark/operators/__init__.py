from observability_platform___databricks_etl_pipeline_spark.operators.dedup import (
    lww_dedup,
    lww_latest_by_key,
    exact_dedup,
)

__all__ = ["lww_dedup", "lww_latest_by_key", "exact_dedup"]
