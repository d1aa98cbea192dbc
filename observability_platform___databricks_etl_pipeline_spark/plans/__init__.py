from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import CommitConflict, LakeVault, TableSchema
from observability_platform___databricks_etl_pipeline_spark.plans.replay import CDCEngine, ReplayResult, TailBatch

__all__ = ["CommitConflict", "LakeVault", "TableSchema", "CDCEngine", "ReplayResult", "TailBatch"]
