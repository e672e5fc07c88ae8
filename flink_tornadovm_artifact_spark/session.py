"""SparkSession factory.

The reference runs Flink standalone clusters with explicit TaskManager/slot
configs (reference README.md "Benchmark Configurations"); the Spark analog is
a session with AQE on, shuffle partitions sized to the parallelism, and
Arrow enabled for the pandas-UDF (accelerated) tier.

All knobs here are chosen for BOTH local[N] testing and a large cluster:
- AQE handles runtime coalescing / skew-join splitting at any scale.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
  coalesces down, so a generous value is safe on a 1000-executor cluster.
- Arrow batch size bounds per-batch memory for mapInPandas/applyInPandas.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink-tornadovm-artifact-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, else all cores. When a session
    already exists (e.g. the verification driver owns it), existing
    immutable confs (master, memory) are left untouched by Spark.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Session-wide, deliberately: events.parquet stores TIMESTAMP(NANOS),
        # which Spark's reader rejects unless nanos are read as raw longs.
        # Set here (not per-read with a restore) because SQLConf is consulted
        # at plan/execution time, not at spark.read() time — restoring after
        # a lazy read would break the scan when the action finally runs.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
