"""Stream iteration (DataStream.iterate / IterativeStream.closeWith):
the file-backed feedback-edge analog, exercised with the reference's
own canonical workload — IterateExample.java's Fibonacci stepper, where
each pair iterates until its value crosses a threshold and then leaves
through the output channel with its iteration count."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.streaming.iterate import StreamIteration

SCHEMA = "pair_id long, a long, b long, iter long"
THRESHOLD = 100


def _expected(pairs):
    out = {}
    for pid, a, b in pairs:
        it = 0
        while a + b < THRESHOLD:
            a, b = b, a + b
            it += 1
        out[pid] = it + 1  # the crossing step also counts, as in Step()
    return out


def _step(df):
    nxt = df.select(
        "pair_id",
        F.col("b").alias("a"),
        (F.col("a") + F.col("b")).alias("b"),
        (F.col("iter") + 1).alias("iter"),
    )
    return (
        nxt.filter(F.col("b") < THRESHOLD),
        nxt.filter(F.col("b") >= THRESHOLD),
    )


def test_stream_iterate_fibonacci(spark, tmp_path):
    pairs = [(0, 1, 1), (1, 2, 3), (2, 10, 20), (3, 60, 50)]
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "pair_id": pa.array([p[0] for p in pairs], pa.int64()),
                "a": pa.array([p[1] for p in pairs], pa.int64()),
                "b": pa.array([p[2] for p in pairs], pa.int64()),
                "iter": pa.array([0] * len(pairs), pa.int64()),
            }
        ),
        str(src_dir / "in.parquet"),
    )
    source = spark.readStream.schema(SCHEMA).parquet(str(src_dir))
    it = StreamIteration(spark, SCHEMA, str(tmp_path / "iter"))
    out = it.run(source, _step)
    got = {r.pair_id: r.iter for r in out.collect()}
    assert got == _expected([(p[0], p[1], p[2]) for p in pairs])
    # pair 3 starts already past the threshold: exactly one step
    assert got[3] == 1
    # pair 0 (fib from 1,1) needs the most feedback passes
    assert got[0] == max(got.values())


def test_stream_iterate_no_feedback_terminates_immediately(spark, tmp_path):
    """A step that never feeds back must terminate after one pass (the
    maxWaitTime no-data condition) and pass everything through."""
    src_dir = tmp_path / "src2"
    src_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "pair_id": pa.array([1, 2], pa.int64()),
                "a": pa.array([5, 6], pa.int64()),
                "b": pa.array([7, 8], pa.int64()),
                "iter": pa.array([0, 0], pa.int64()),
            }
        ),
        str(src_dir / "in.parquet"),
    )
    source = spark.readStream.schema(SCHEMA).parquet(str(src_dir))
    it = StreamIteration(spark, SCHEMA, str(tmp_path / "iter2"))
    out = it.run(
        source, lambda df: (df.filter(F.lit(False)), df), max_passes=3
    )
    assert out.count() == 2


def test_connected_stream_iterate_with_feedback_type(spark, tmp_path):
    """withFeedbackType analog: the feedback edge carries a different
    type (value, steps) than the input (seed values only); the step is
    a co-function — input leg seeds the loop, feedback leg keeps
    halving until the value reaches 1, then emits (seed, steps)."""
    from flink_tornadovm_artifact_spark.streaming.iterate import (
        ConnectedStreamIteration,
    )

    seeds = [1, 5, 16, 37]
    src_dir = tmp_path / "csrc"
    src_dir.mkdir()
    pq.write_table(
        pa.table({"seed": pa.array(seeds, pa.int64())}),
        str(src_dir / "in.parquet"),
    )
    source = spark.readStream.schema("seed long").parquet(str(src_dir))

    def step(in_df, fb_df):
        entered = in_df.select(
            F.col("seed").alias("orig"),
            F.col("seed").alias("val"),
            F.lit(0).cast("long").alias("steps"),
        )
        looped = fb_df.select(
            "orig",
            (F.col("val") / 2).cast("long").alias("val"),
            (F.col("steps") + 1).alias("steps"),
        )
        both = entered.unionByName(looped)
        return (
            both.filter(F.col("val") > 1),
            both.filter(F.col("val") <= 1).select("orig", "steps"),
        )

    it = ConnectedStreamIteration(
        spark,
        input_schema="seed long",
        feedback_schema="orig long, val long, steps long",
        workdir=str(tmp_path / "citer"),
        output_schema="orig long, steps long",
    )
    out = it.run(source, step)
    got = {r.orig: r.steps for r in out.collect()}

    def halvings(v):
        s = 0
        while v > 1:
            v //= 2
            s += 1
        return s

    assert got == {s: halvings(s) for s in seeds}
    assert got[1] == 0 and got[16] == 4


def test_connected_stream_iterate_rejects_overlapping_fields(spark, tmp_path):
    from flink_tornadovm_artifact_spark.streaming.iterate import (
        ConnectedStreamIteration,
    )
    import pytest as _pytest

    it = ConnectedStreamIteration(
        spark,
        input_schema="x long",
        feedback_schema="x long, n long",
        workdir=str(tmp_path / "bad"),
    )
    source = spark.readStream.schema("x long").parquet(str(tmp_path / "bad"))
    with _pytest.raises(ValueError, match="disjoint"):
        it.run(source, lambda a, b: (a, a))
