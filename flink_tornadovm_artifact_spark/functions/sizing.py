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
