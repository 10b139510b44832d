"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); the configs below are chosen so
the same logical plans scale to a multi-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), UTC session timezone so results
are engine-independent, Arrow for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "aws_vpc_flow_log_appender_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``shuffle_partitions`` defaults to ``SPARK_GRAFT_CPUS`` (or 32): on a real
    cluster this would be ~2-3x total cores; AQE coalesces small post-shuffle
    partitions either way, so the number only needs an upper bound.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    spark = builder.getOrCreate()
    # getOrCreate silently returns ANY pre-existing session with every
    # builder config ignored — including the UTC timezone the oracle
    # comparison requires. Re-apply the runtime-settable subset so a
    # session created elsewhere first still meets the engine's contract
    # (code-review r6); static confs (master, memory) genuinely cannot
    # change post-start and stay as the first creator set them.
    configure_existing(spark)
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to a session we did not build.

    The driver passes its own SparkSession to ``queries()`` callables; only
    runtime-mutable confs can be set there (timezone matters for oracle
    comparison against DuckDB's UTC-naive timestamps).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
