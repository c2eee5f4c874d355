"""SparkSession factory with scale-oriented defaults.

Every config here is chosen for the 100 TB posture (AQE re-planning,
skew-join handling, partition coalescing, Arrow for the Python boundary)
while remaining correct on local[N] test runs. Tests/bench override
parallelism via env vars rather than hand-tuned code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# 128 MiB parquet split target — matches HDFS-era block sizing and keeps
# ~100k tasks for a 100 TB scan, which Spark's scheduler handles fine.
_MAX_PARTITION_BYTES = str(128 * 1024 * 1024)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bitcoinminingetl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster the ``master`` would come from spark-submit; local[N]
    is the test harness. ``spark.sql.shuffle.partitions`` is a *starting*
    value — AQE coalesces small post-shuffle partitions and splits skewed
    ones at runtime, which is the scale-out story for 1000 executors.
    """
    cpus = cpus or default_parallelism()
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", _MAX_PARTITION_BYTES)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.mergeSchema", "false")
    )
    return builder.getOrCreate()
