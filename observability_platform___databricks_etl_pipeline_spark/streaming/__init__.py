from observability_platform___databricks_etl_pipeline_spark.streaming.analytics import (
    sessionize_stream,
    stage_ordered_events,
    windowed_rollup_stream,
)
from observability_platform___databricks_etl_pipeline_spark.streaming.stream import stream_replay

__all__ = [
    "stream_replay",
    "stage_ordered_events",
    "windowed_rollup_stream",
    "sessionize_stream",
]
