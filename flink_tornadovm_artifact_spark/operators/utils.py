"""DataSet utility operators — the reference's
``flink-java/.../api/java/utils/DataSetUtils.java`` surface:
zipWithIndex (:89), zipWithUniqueId (:149), sample (:195,:213) and
sampleWithSize (:232,:251).

Spark-first mappings:

- ``zip_with_index`` reproduces Flink's two-phase algorithm (count
  elements per partition, then re-map with cumulative offsets) entirely
  in DataFrame operations: a per-partition row_number (window keyed on
  ``spark_partition_id()`` — no global shuffle, each partition sorts
  only itself) plus a broadcast join against the per-partition
  cumulative counts. Ids are contiguous 0..n-1; the assignment order
  within/across partitions is arbitrary, exactly as in Flink.
- ``zip_with_unique_id`` is ``monotonically_increasing_id()`` — Flink's
  contract (unique, NOT contiguous, per-partition bit-pattern) is
  precisely what Spark's builtin provides (same shift-the-partition-id
  construction).
- ``sample`` maps to ``DataFrame.sample`` (Bernoulli / Poisson per
  element, the same semantics as Flink's RandomSampler split).
- ``sample_with_size`` draws an exact-size uniform sample as the top-k
  by a random key: Spark plans ``TakeOrderedAndProject`` — a bounded
  per-partition heap then a k-merge, the distributed equivalent of the
  reference's reservoir sampling (O(k) memory per partition, no global
  sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zip_with_index(df: DataFrame, index_col: str = "index") -> DataFrame:
    """Contiguous dense ids 0..n-1 (DataSetUtils.zipWithIndex)."""
    pid = F.spark_partition_id()
    with_pid = df.withColumn("_zwi_pid", pid).withColumn(
        "_zwi_mono", F.monotonically_increasing_id()
    )
    in_part = Window.partitionBy("_zwi_pid").orderBy("_zwi_mono")
    numbered = with_pid.withColumn(
        "_zwi_rn", F.row_number().over(in_part) - 1
    )
    counts = (
        with_pid.groupBy("_zwi_pid")
        .agg(F.count(F.lit(1)).alias("_zwi_cnt"))
        .withColumn(
            "_zwi_offset",
            F.coalesce(
                F.sum("_zwi_cnt").over(
                    Window.orderBy("_zwi_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_zwi_pid", "_zwi_offset")
    )
    return (
        numbered.join(F.broadcast(counts), "_zwi_pid")
        .withColumn(index_col, (F.col("_zwi_rn") + F.col("_zwi_offset")))
        .drop("_zwi_pid", "_zwi_mono", "_zwi_rn", "_zwi_offset")
    )


def zip_with_unique_id(df: DataFrame, id_col: str = "unique_id") -> DataFrame:
    """Unique (non-contiguous) ids (DataSetUtils.zipWithUniqueId)."""
    return df.withColumn(id_col, F.monotonically_increasing_id())


def sorted_rank(
    df: DataFrame,
    col: str,
    rank_col: str = "rid",
    num_partitions: int = 32,
) -> DataFrame:
    """Dense 0-based rank of every row by ``col`` — the zip_with_index
    two-phase mechanism, but ordered by a column instead of arrival
    order, so the result is DETERMINISTIC given distinct ``col`` values
    (the property an oracle can reproduce with ``ROW_NUMBER() OVER
    (ORDER BY col)``).

    Scale shape: a global window rank would sort everything into ONE
    partition; this ranges-partitions on ``col`` (parallel sort), ranks
    within each range partition, and adds broadcast cumulative
    partition offsets — every stage is parallel, per-partition memory
    is one range's rows. ``localCheckpoint`` pins the sampled range
    bounds so the rank pass and the count pass see the SAME partition
    assignment (repartitionByRange re-samples bounds per job
    otherwise — the two passes could disagree and corrupt offsets).
    Lazy checkpoint keeps query BUILD side-effect-free (the family's
    lazy-builder rule): the pin materializes with the first action.
    """
    part = df.repartitionByRange(num_partitions, col).localCheckpoint(
        eager=False
    )
    with_pid = part.withColumn("_sr_pid", F.spark_partition_id())
    in_part = Window.partitionBy("_sr_pid").orderBy(col)
    numbered = with_pid.withColumn(
        "_sr_rn", F.row_number().over(in_part) - 1
    )
    counts = (
        with_pid.groupBy("_sr_pid")
        .agg(F.count(F.lit(1)).alias("_sr_cnt"))
        .withColumn(
            "_sr_offset",
            F.coalesce(
                F.sum("_sr_cnt").over(
                    Window.orderBy("_sr_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_sr_pid", "_sr_offset")
    )
    return (
        numbered.join(F.broadcast(counts), "_sr_pid")
        .withColumn(rank_col, F.col("_sr_rn") + F.col("_sr_offset"))
        .drop("_sr_pid", "_sr_rn", "_sr_offset")
    )


def sample(
    df: DataFrame,
    fraction: float,
    with_replacement: bool = False,
    seed: int | None = None,
) -> DataFrame:
    """Bernoulli / Poisson element sample (DataSetUtils.sample)."""
    return df.sample(
        withReplacement=with_replacement, fraction=fraction, seed=seed
    )


def sample_with_size(df: DataFrame, n: int, seed: int = 7) -> DataFrame:
    """Exact-size uniform sample without replacement
    (DataSetUtils.sampleWithSize) — top-n by random key, planned as a
    bounded-memory TakeOrdered (distributed reservoir equivalent)."""
    return (
        df.withColumn("_sws_r", F.rand(seed))
        .orderBy("_sws_r")
        .limit(n)
        .drop("_sws_r")
    )
