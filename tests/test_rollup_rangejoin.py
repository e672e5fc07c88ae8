"""Continuous aggregate (hypertable rollup) + generic banded range
join: incremental maintenance matches the batch aggregate exactly,
across writer generations; serve() folds in the raw tail; range_join
equals the brute-force band predicate."""

from __future__ import annotations

import datetime as dt
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

_EPOCH = dt.datetime(2024, 1, 1)


def _write(path, rows):  # (event_id, etype, minute, value)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "etype": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [_EPOCH + dt.timedelta(minutes=r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            }
        ),
        str(path),
    )


ROWS_A = [  # two hourly buckets, two types
    (1, "a", 5, 1.0),
    (2, "a", 20, 3.0),
    (3, "b", 30, 10.0),
    (4, "a", 65, 5.0),
]
ROWS_B = [
    (5, "a", 10, 7.0),   # lands in bucket 0 AFTER it was materialized
    (6, "b", 70, 2.0),
    (7, "b", 75, 4.0),
]
TAIL = [
    (8, "a", 15, 100.0),  # un-streamed tail row in the oldest bucket
    (9, "c", 130, 1.0),   # brand-new key+bucket only in the tail
]


def _batch_truth(spark, rows):
    df = spark.createDataFrame(
        [
            (r[0], r[1], _EPOCH + dt.timedelta(minutes=r[2]), float(r[3]))
            for r in rows
        ],
        "event_id long, etype string, ts timestamp, value double",
    )
    got = (
        df.groupBy(F.window("ts", "1 hour").start.alias("bucket_start"), "etype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .withColumn("avg_v", F.col("sum_v") / F.col("n"))
    )
    return {
        (r.bucket_start, r.etype): (r.n, r.sum_v, r.min_v, r.max_v, r.avg_v)
        for r in got.collect()
    }


def _as_dict(df):
    return {
        (r.bucket_start, r.etype): (r.n, r.sum_v, r.min_v, r.max_v, r.avg_v)
        for r in df.collect()
    }


def test_continuous_aggregate_incremental_and_tail(spark, tmp_path):
    from flink_tornadovm_artifact_spark.streaming import ContinuousAggregate

    src = tmp_path / "ca_src"
    src.mkdir()
    ckpt = str(tmp_path / "ca_ckpt")
    _write(src / "b0.parquet", ROWS_A)

    ca = ContinuousAggregate(
        keys=["etype"],
        ts_col="ts",
        value_col="value",
        bucket="1 hour",
        path=str(tmp_path / "ca_rollup"),
    )
    stream = spark.readStream.schema(
        "event_id long, etype string, ts timestamp, value double"
    ).parquet(str(src))

    # generation 1
    q = ca.attach(stream, checkpoint=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _as_dict(ca.rollup(spark)) == _batch_truth(spark, ROWS_A)

    # generation 2: fresh writer on the same checkpoint; late data lands
    # in an ALREADY-MATERIALIZED bucket — the update-mode cumulative row
    # must win over generation 1's version (epoch stamping)
    time.sleep(1.1)
    _write(src / "b1.parquet", ROWS_B)
    ca2 = ContinuousAggregate(
        keys=["etype"], ts_col="ts", value_col="value",
        bucket="1 hour", path=str(tmp_path / "ca_rollup"),
    )
    q2 = ca2.attach(stream, checkpoint=ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert _as_dict(ca2.rollup(spark)) == _batch_truth(spark, ROWS_A + ROWS_B)

    # real-time serve: raw tail merges via the partial algebra —
    # straddling bucket (a, hour 0) and a tail-only key both correct
    tail_df = spark.createDataFrame(
        [
            (r[0], r[1], _EPOCH + dt.timedelta(minutes=r[2]), float(r[3]))
            for r in TAIL
        ],
        "event_id long, etype string, ts timestamp, value double",
    )
    assert _as_dict(ca2.serve(spark, tail_df)) == _batch_truth(
        spark, ROWS_A + ROWS_B + TAIL
    )

    # compaction folds the log without changing answers
    ca2.compact(spark)
    assert _as_dict(ca2.rollup(spark)) == _batch_truth(spark, ROWS_A + ROWS_B)


def test_continuous_aggregate_attach_api(spark, tmp_path):
    """attach() is the public maintenance entry (no checkpoint option —
    caller-managed restart not exercised here)."""
    from flink_tornadovm_artifact_spark.streaming import ContinuousAggregate

    src = tmp_path / "ca2_src"
    src.mkdir()
    _write(src / "b0.parquet", ROWS_A)
    ca = ContinuousAggregate(
        keys=["etype"], ts_col="ts", value_col="value",
        bucket="1 hour", path=str(tmp_path / "ca2_rollup"),
    )
    stream = spark.readStream.schema(
        "event_id long, etype string, ts timestamp, value double"
    ).parquet(str(src))
    q = ca.attach(stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _as_dict(ca.rollup(spark)) == _batch_truth(spark, ROWS_A)


def test_range_join_matches_bruteforce(spark):
    from flink_tornadovm_artifact_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, 0.0), (1, 10.0), (2, 5.0), (2, 7.5), (3, -4.0)],
        "k long, lv double",
    )
    right = spark.createDataFrame(
        [(1, 2.0), (1, 12.5), (1, 30.0), (2, 5.0), (2, 11.0), (3, -1.5)],
        "k long, rv double",
    )
    lower, upper = -1.0, 4.0
    got = sorted(
        (r.k, r.lv, r.rv)
        for r in range_join(left, right, "k", "lv", "rv", lower, upper).collect()
    )
    brute = sorted(
        (r.k, r.lv, r.rv)
        for r in left.join(right, "k")
        .filter(F.col("rv").between(F.col("lv") + lower, F.col("lv") + upper))
        .collect()
    )
    assert got == brute and len(got) > 0


def test_range_join_guards(spark):
    from flink_tornadovm_artifact_spark.operators.temporal import range_join

    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="upper > lower"):
        range_join(df, df.withColumnRenamed("v", "w"), "k", "v", "w", 5, 5)
    with pytest.raises(ValueError, match="shared by both sides"):
        range_join(df, df, "k", "v", "v", 0, 1)


def test_continuous_aggregate_reads_before_first_commit(spark, tmp_path):
    """A just-created aggregate (no committed batch yet) must serve an
    empty, correctly-typed rollup when the events schema is declared —
    not a path-not-found crash."""
    from flink_tornadovm_artifact_spark.streaming import ContinuousAggregate

    schema = "event_id long, etype string, ts timestamp, value double"
    ca = ContinuousAggregate(
        keys=["etype"], ts_col="ts", value_col="value", bucket="1 hour",
        path=str(tmp_path / "fresh_rollup"), events_schema=schema,
    )
    assert ca.rollup(spark).count() == 0
    assert set(ca.rollup(spark).columns) == {
        "bucket_start", "etype", "n", "sum_v", "min_v", "max_v", "avg_v"
    }
    # and serve() over only a tail aggregates that tail alone
    tail = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1, 0, 30), 2.0)], schema
    )
    got = ca.serve(spark, tail).collect()
    assert len(got) == 1 and got[0].n == 1 and got[0].avg_v == 2.0


def test_continuous_aggregate_broken_store_raises(spark, tmp_path):
    """The events_schema fallback covers ONLY the no-committed-batch-yet
    (missing path) case. A store path that exists but cannot be read —
    corrupt footer here — must raise, not silently serve an empty
    rollup to a dashboard (round-7 ADVICE fix)."""
    from flink_tornadovm_artifact_spark.streaming import ContinuousAggregate

    store = tmp_path / "broken_rollup"
    store.mkdir()
    (store / "part-00000.parquet").write_bytes(b"this is not parquet")
    ca = ContinuousAggregate(
        keys=["etype"], ts_col="ts", value_col="value", bucket="1 hour",
        path=str(store),
        events_schema="event_id long, etype string, ts timestamp, value double",
    )
    # surfaces as the JVM's corrupt-footer error (not AnalysisException,
    # which _latest_or_empty narrows to the PATH_NOT_FOUND condition)
    with pytest.raises(Exception, match="[Ff]ooter|[Pp]arquet"):
        ca.rollup(spark).collect()
