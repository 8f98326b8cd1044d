"""SparkSession factory with the configs the pipeline relies on.

Arrow transfer on, AQE on (runtime re-plan + skew handling), shuffle
partitions sized for the local harness but overridable for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 1024  # Arrow batch size for mapInPandas (R1 analog)


def get_spark(
    app_name: str = "doc_parser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    files_max_partition_bytes: str = "32m",
) -> SparkSession:
    """files_max_partition_bytes defaults low (32m) because local benches read
    a handful of medium parquet files; a real cluster reading an Iceberg table
    with well-sized data files should pass "128m"."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        .config("spark.sql.files.maxPartitionBytes", files_max_partition_bytes)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
