"""Scale utilities: skew mitigation and co-located joins.

These are the knobs SURVEY.md §7's 100 TB discipline calls for beyond
what AQE does automatically:

- ``salted_agg`` — two-phase aggregation for *pathologically* skewed
  group keys (one key = billions of rows). AQE's skew handling splits
  skewed JOIN partitions, but a skewed groupBy still funnels each key
  into one reducer; salting fans the hot key across ``n_salts`` partial
  groups, then merges. Only decomposable aggregates qualify (sum, count,
  min, max — the same associative+commutative contract as the
  reference's GPU reduce, ReduceDriver.java:252-300).
- ``write_bucketed`` / ``read_bucketed`` — persist a fact table bucketed
  by its join key so repeated equi-joins/aggregations on that key skip
  the shuffle entirely (the Spark analog of the reference's
  partitionByHash + reused "interesting properties",
  InterestingProperties.java).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: aggregate name → (partial expr builder, merge expr builder)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs``: output column → (agg_name, input column), agg_name in
    {sum, count, min, max}. Example::

        salted_agg(events, ["user_id"],
                   {"total": ("sum", "value"), "n": ("count", "value")})

    Phase 1 groups on (keys…, salt) — the hot key spreads over
    ``n_salts`` reducers; phase 2 merges the ≤ n_salts partials per key.
    The phase-2 input is at most ``n_salts ×`` the distinct-key count,
    so the second shuffle is tiny.
    """
    for out, (name, _col) in aggs.items():
        if name not in _DECOMPOSABLE:
            raise ValueError(
                f"{out}: {name!r} is not decomposable; use applyInPandas"
            )
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt__")
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(*keys, "__salt__")
        .agg(
            *[
                _DECOMPOSABLE[name][0](col).alias(out)
                for out, (name, col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[name][1](out).alias(out)
            for out, (name, _col) in aggs.items()
        ]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed parquet table.
    Joins/aggregations between tables bucketed identically on the join
    key execute shuffle-free (SortMergeJoin reads co-located buckets)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def explain_has_exchange(df: DataFrame) -> bool:
    """True if the plan still contains a shuffle Exchange — use to assert
    a bucketed join/agg actually skipped the shuffle."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    return "Exchange hashpartitioning" in plan
