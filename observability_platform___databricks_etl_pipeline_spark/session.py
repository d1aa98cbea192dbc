"""SparkSession factory with scale-oriented defaults.

The reference configures its cluster in ``jobs/hourly_etl.json:19-35``
(4x i3.xlarge, Delta optimizeWrite/autoCompact); here the equivalent knobs are
plain Spark confs chosen so the same code runs on ``local[N]`` in tests and on
a 1000-executor cluster unchanged:

- AQE on (runtime coalescing + skew-join splitting),
- Arrow on for pandas UDFs (the vectorized-transform mandate),
- UTC session timezone (oracle comparison with DuckDB, which is UTC-naive),
- shuffle partitions sized to the local core count; at cluster scale this is
  expected to be overridden via ``spark-submit --conf`` (AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "cdc-ingest-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; under a real
    ``spark-submit`` the submitted master wins (pass ``master=None`` and the
    builder inherits it).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the lakevault Python data source prunes files from pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
