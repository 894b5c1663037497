"""SparkSession factory with scale-oriented defaults.

Single place where shuffle partitioning, AQE, and Arrow settings are
configured so tests, bench.py, and the driver contract all run the same
engine configuration.  On a real cluster the same builder is used via
``spark-submit --py-files``; only master/cores differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "go-shapefile-spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              max_partition_bytes: str | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # Rule of thumb: 1-2x cores for local; on a 1000-executor cluster
        # this would be set to ~2-3x total cores or left to AQE coalescing.
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes",
                max_partition_bytes or os.environ.get(
                    "SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
