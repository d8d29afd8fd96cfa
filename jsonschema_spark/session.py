"""SparkSession factory tuned for the validation workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "jsonschema_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local session with the knobs that matter at scale turned on:
    AQE (runtime re-plan + skew-join splitting), Arrow for the pandas-UDF
    tier, ANSI off (validation wants NULL-tolerant expression semantics,
    not errors), UTC for oracle comparison.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle = shuffle_partitions or cores
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
