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
