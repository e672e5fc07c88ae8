"""Continuous aggregate — the hypertable-rollup pattern (TimescaleDB
continuous aggregates; Flink users build the same thing as a windowed
aggregate feeding an upsert sink). A time-bucketed rollup table is
maintained INCREMENTALLY by a streaming query, and reads optionally
merge the not-yet-materialized raw tail — so dashboards aggregate
decades of data by scanning the (tiny) rollup plus minutes of tail,
never the raw hypertable.

Spark-first shape:
- the maintenance query is a stock update-mode windowed aggregate —
  Catalyst plans the partial/final split and the state store holds one
  row per live (bucket, key);
- each micro-batch's CHANGED buckets append to a parquet log stamped
  with the monotonic commit sequence of ``ExternalQueryableState``
  (same reasoning: epoch ids restart per checkpoint, wall clocks step
  back; the log-max floor survives writer generations), and readers
  resolve latest-per-(bucket, key) with one window rank;
- the rollup stores MERGEABLE PARTIALS (count / sum / min / max), so
  serving can fold in a raw tail by re-aggregating the union of
  partials — the standard partial-aggregate algebra, identical to what
  Catalyst's own partial/final split does and to the reference's
  combiner contract (ReduceDriver.java's assoc+comm requirement).

At 100 TB: the rollup is bucket-cardinality-sized (days × keys), the
maintenance stream shuffles only per-batch deltas, and serving scans
rollup + tail — the raw table is never re-aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from .core import ExternalQueryableState


def bucket_partials(
    df: DataFrame, keys: list[str], ts_col: str, value_col: str, bucket: str
) -> DataFrame:
    """The mergeable time-bucket partials (count/sum/min/max) shared by
    the streaming maintenance path, the batch rollup query
    (queries/temporal_q.py:hypertable_rollup_events), and serve()'s
    tail merge — one definition so batch and streaming semantics cannot
    drift apart."""
    v = F.col(value_col)
    return df.groupBy(
        F.window(ts_col, bucket).start.alias("bucket_start"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def with_avg(parts: DataFrame) -> DataFrame:
    return parts.withColumn("avg_v", F.col("sum_v") / F.col("n"))


class ContinuousAggregate:
    """Incrementally-maintained time-bucket rollup of a value column.

    ``keys`` are the grouping dimensions besides the time bucket;
    ``bucket`` is a window duration string (``"1 hour"``). The rollup
    row is (bucket_start, *keys, n, sum_v, min_v, max_v); ``rollup()``
    adds the derived ``avg_v``. ``serve(tail_df=...)`` merges raw rows
    that have not been streamed through the maintenance query yet (the
    real-time part of a continuous aggregate).
    """

    def __init__(
        self,
        keys: list[str],
        ts_col: str,
        value_col: str,
        bucket: str,
        path: str,
        events_schema: str | None = None,
    ):
        self.keys = list(keys)
        self.ts_col = ts_col
        self.value_col = value_col
        self.bucket = bucket
        #: optional events DDL; with it, reads BEFORE the first committed
        #: micro-batch return a correctly-typed EMPTY rollup instead of a
        #: path-not-found error (a dashboard on a just-created aggregate
        #: sees zero rows, not a crash)
        self.events_schema = events_schema
        # composite logical key; the epoch log stores it as one struct
        # column so ExternalQueryableState's single-key resolution works
        self._store = ExternalQueryableState("__ckey", path)

    # -- partial-aggregate algebra -------------------------------------
    def _partials(self, df: DataFrame) -> DataFrame:
        return bucket_partials(
            df, self.keys, self.ts_col, self.value_col, self.bucket
        )

    def _latest_or_empty(self, spark: SparkSession) -> DataFrame:
        try:
            return self._store.snapshot_df(spark).drop("__ckey")
        except AnalysisException as exc:
            # Only the no-committed-batch-yet case (epoch-log path does
            # not exist) may fall back to an empty rollup; any OTHER
            # read failure — corrupt footer, permission error, transient
            # FS fault — must surface, or a dashboard silently shows
            # zero rows over a broken store.
            cls = exc.getCondition() or ""
            if self.events_schema is None or "PATH_NOT_FOUND" not in cls:
                raise
            # derive the exact rollup schema by aggregating an empty,
            # correctly-typed events frame
            return self._partials(
                spark.createDataFrame([], self.events_schema)
            )

    @staticmethod
    def _merge(parts: DataFrame, group_cols: list[str]) -> DataFrame:
        return parts.groupBy(*group_cols).agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )

    def _with_ckey(self, parts: DataFrame) -> DataFrame:
        return parts.withColumn(
            "__ckey", F.struct("bucket_start", *self.keys)
        )

    # -- maintenance ----------------------------------------------------
    def attach(self, events: DataFrame, checkpoint: str | None = None):
        """Start the maintenance query on a STREAMING events frame;
        returns the StreamingQuery (caller owns stop()). Update mode:
        each micro-batch emits the new cumulative partials for CHANGED
        buckets only; the epoch log keeps every version and readers take
        the latest. Pass ``checkpoint`` so a successor writer generation
        resumes the aggregate state instead of recounting from zero."""
        agg = self._with_ckey(self._partials(events))
        writer = agg.writeStream.outputMode("update").foreachBatch(
            self._store.on_batch
        )
        if checkpoint is not None:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()

    # -- reads ----------------------------------------------------------
    def rollup(self, spark: SparkSession) -> DataFrame:
        """The materialized rollup: latest partials per (bucket, keys),
        with the derived average."""
        return with_avg(self._latest_or_empty(spark))

    def serve(
        self, spark: SparkSession, tail_df: DataFrame | None = None
    ) -> DataFrame:
        """Rollup plus the un-materialized raw tail (batch frame of rows
        the stream has not ingested yet) — buckets straddling the
        materialization frontier merge via the partial algebra."""
        latest = self._latest_or_empty(spark)
        if tail_df is not None:
            latest = latest.unionByName(self._partials(tail_df))
        merged = self._merge(latest, ["bucket_start", *self.keys])
        return with_avg(merged)

    def compact(self, spark: SparkSession) -> None:
        """Fold the epoch log to one row per (bucket, keys)."""
        self._store.compact(spark)
