"""Shuffle-width scoping for iterative pipelines.

Each superstep of an iterative pipeline localCheckpoints (or collects)
its result, which materializes at the session shuffle width BEFORE AQE
can coalesce — under a default 200-partition session a small input
schedules 200 tasks per stage per iteration, pure scheduling overhead.
Deriving the width from the input keeps the code scale-adaptive: a
100 TB input arrives in thousands of partitions and gets a matching
shuffle width, while test-scale data gets single-digit widths.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


@contextmanager
def sized_shuffle(df: DataFrame, floor: int = 8):
    """Scope ``spark.sql.shuffle.partitions`` to ``df``'s own partition
    count for the duration of the block, restoring the previous value
    after (even on error)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(floor, df.rdd.getNumPartitions())),
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def spread_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan up to the session's default
    parallelism when the source supplies fewer splits (round 12, guide
    §2.5 input-skew remedy: "repartition immediately after the read").

    The test corpora are single-row-group parquet files, so every scan
    is ONE task and every expression-heavy first stage (shingling,
    per-token hashing, char explodes) runs on one core regardless of
    cluster width. The guard makes the helper scale-adaptive rather
    than a local[32] tune: a production 100 TB table arrives in
    thousands of splits >= defaultParallelism and the repartition is a
    no-op; an unsplittable-input pathology (one giant gzip) gets the
    same remedy the guide prescribes. The shuffle moves the scan
    columns once — only adopt it where the downstream per-row work
    dominates that copy (measured per query, see OPTIMIZATION_r12.md).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
