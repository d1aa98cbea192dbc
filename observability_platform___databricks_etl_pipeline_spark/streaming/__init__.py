from observability_platform___databricks_etl_pipeline_spark.streaming.stream import stream_replay

__all__ = ["stream_replay"]
