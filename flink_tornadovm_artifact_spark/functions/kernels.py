"""Data-parallel numeric kernels (the reference's benchmark set, §6).

Each kernel mirrors one reference benchmark program:

- ``vector_add``    — TestVectorAddition.java:67 (map over Tuple2<Float,Float>)
- ``matmul_rows``   — TestMatrixMultiplication.java:77 (row-map × broadcast matrix)
- ``dft``           — TestDFT.java:83 (map over indices with broadcast signal)
- ``pi_estimation`` — TestPiEstimation.java:52-58 (map sample + reduce sum)

All are Arrow-batched (``mapInArrow``/``mapInPandas``) over columnar
batches — the Spark analog of the reference's flat-buffer marshalling
(``DataTransformation.java``) — with the array math on the pluggable
NumPy/CuPy backend. Broadcast inputs ride Spark broadcast variables, the
analog of the reference's broadcast marshalling (``MapDriver.java:185-205``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .backend import get_backend, to_numpy


def vector_add(
    df: DataFrame,
    a: str = "a",
    b: str = "b",
    out: str = "s",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Element-wise add of two columns via an Arrow batch kernel.
    ``keep`` columns pass through unchanged (e.g. a row id)."""

    def kernel(batches):
        xp = get_backend()
        for batch in batches:
            x = xp.asarray(batch.column(a).to_numpy(zero_copy_only=False))
            y = xp.asarray(batch.column(b).to_numpy(zero_copy_only=False))
            cols = [batch.column(k) for k in keep]
            yield pa.RecordBatch.from_arrays(
                cols + [pa.array(to_numpy(x + y))], names=[*keep, out]
            )

    kept = "".join(
        f"{k} {dict(df.dtypes)[k]}, " for k in keep
    )
    return df.mapInArrow(kernel, f"{kept}{out} double")


def matmul_rows(
    rows: DataFrame, matrix: np.ndarray, vec_col: str = "vec", id_col: str = "row_id"
) -> DataFrame:
    """Row-wise matrix multiply: each input row holds one matrix row as an
    array column; the right-hand matrix is broadcast once per executor
    (reference: map with withBroadcastSet, TestMatrixMultiplication)."""
    sc = rows.sparkSession.sparkContext
    bmat = sc.broadcast(np.asarray(matrix, dtype=np.float64))

    def kernel(pdfs):
        xp = get_backend()
        m = xp.asarray(bmat.value)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            x = xp.asarray(np.stack(pdf[vec_col].to_numpy()))
            prod = to_numpy(x @ m)
            yield pdf.assign(**{vec_col: list(prod)})

    return rows.mapInPandas(kernel, f"{id_col} long, {vec_col} array<double>")


def dft(signal: np.ndarray, spark: SparkSession, partitions: int = 8) -> DataFrame:
    """Dense DFT of a 1-D real signal: distribute the output indices k,
    broadcast the signal (reference: TestDFT maps over indices with the
    signal as broadcast set). Returns (k, re, im)."""
    n = len(signal)
    bsig = spark.sparkContext.broadcast(np.asarray(signal, dtype=np.float64))
    ks = spark.range(0, n, 1, partitions).withColumnRenamed("id", "k")

    def kernel(pdfs):
        xp = get_backend()
        x = xp.asarray(bsig.value)
        nn = len(x)
        idx = xp.arange(nn)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            k = xp.asarray(pdf["k"].to_numpy())[:, None]
            ang = -2.0 * np.pi * k * idx[None, :] / nn
            re = to_numpy((xp.cos(ang) * x).sum(axis=1))
            im = to_numpy((xp.sin(ang) * x).sum(axis=1))
            yield pdf.assign(re=re, im=im)

    return ks.mapInPandas(kernel, "k long, re double, im double")


def _splitmix64(x):
    """Deterministic per-index uniforms in [0,1): a vectorized splitmix64
    mix so the sample stream is reproducible independent of partitioning
    (no per-partition RNG state)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def pi_estimation(spark: SparkSession, n_samples: int, partitions: int = 32) -> float:
    """Monte-Carlo pi: map(sample) + reduce(sum), the reference's
    pi-map.cl / pi-reduce.cl pipeline. Deterministic via index-keyed
    hashing, so the result is independent of partition layout."""
    ids = spark.range(0, n_samples, 1, partitions)

    def kernel(batches):
        for batch in batches:
            i = batch.column("id").to_numpy().astype(np.uint64)
            x = _splitmix64(i * np.uint64(2))
            y = _splitmix64(i * np.uint64(2) + np.uint64(1))
            inside = ((x * x + y * y) <= 1.0).astype(np.int64)
            yield pa.RecordBatch.from_arrays([pa.array(inside)], names=["inside"])

    hits = (
        ids.mapInArrow(kernel, "inside long")
        .agg(F.sum("inside").alias("h"))
        .collect()[0]["h"]
    )
    return 4.0 * hits / n_samples
