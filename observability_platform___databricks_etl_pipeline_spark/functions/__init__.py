"""Vectorized row-transform functions (pandas/Arrow UDFs + native columns).

The reference runs all of this logic as per-row driver Python
(``00_ingest_from_loghub.py:167-247,313-352``, ``docs/PRODUCTION_DATA_GUIDE.md:64-99``,
``10_dashboard_video.py:133-142``) — the anti-pattern the north rule bans.
Every function here is either a native ``pyspark.sql.functions`` expression
(JVM, whole-stage-codegen'd) or an Arrow-batched pandas UDF. No per-row Python.
"""

from observability_platform___databricks_etl_pipeline_spark.functions.sanitize import sanitize_udf, sanitize_series
from observability_platform___databricks_etl_pipeline_spark.functions.langinfer import infer_lang_udf, infer_lang_series
from observability_platform___databricks_etl_pipeline_spark.functions.classify import classify_op_udf, classify_op_series
from observability_platform___databricks_etl_pipeline_spark.functions.hashing import content_sha256

__all__ = [
    "sanitize_udf",
    "sanitize_series",
    "infer_lang_udf",
    "infer_lang_series",
    "classify_op_udf",
    "classify_op_series",
    "content_sha256",
]
