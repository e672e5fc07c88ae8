"""Numeric-kernel golden tests vs NumPy — mirroring the reference's
dual-mode (accelerated vs CPU) element-wise comparison with tolerance
(TestMatrixMultiplication.java:88-96 uses 0.01; we use tighter bounds
since both sides are IEEE double)."""

from __future__ import annotations

import numpy as np
import pytest

from flink_tornadovm_artifact_spark.functions import (
    dft,
    pi_estimation,
    vector_add,
    matmul_rows,
)
from flink_tornadovm_artifact_spark.functions.kmeans import kmeans, kmeans_numpy
from flink_tornadovm_artifact_spark.functions.logreg import predict, train, train_numpy


def test_vector_add(spark):
    rng = np.random.RandomState(42)
    a, b = rng.rand(1000), rng.rand(1000)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(a, b)], "a double, b double"
    )
    got = np.sort(np.array([r.s for r in vector_add(df).collect()]))
    want = np.sort(a + b)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_matmul_rows(spark):
    rng = np.random.RandomState(42)
    A = rng.rand(16, 8)
    M = rng.rand(8, 8)
    rows = spark.createDataFrame(
        [(i, A[i].tolist()) for i in range(16)], "row_id long, vec array<double>"
    )
    out = {r.row_id: np.array(r.vec) for r in matmul_rows(rows, M).collect()}
    want = A @ M
    got = np.stack([out[i] for i in range(16)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_dft(spark):
    rng = np.random.RandomState(42)
    sig = rng.rand(64)
    rows = dft(sig, spark, partitions=4).collect()
    got = np.zeros(64, dtype=complex)
    for r in rows:
        got[r.k] = r.re + 1j * r.im
    want = np.fft.fft(sig)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_pi_estimation(spark):
    pi = pi_estimation(spark, 200_000, partitions=8)
    assert abs(pi - np.pi) < 0.02
    # deterministic across partition layouts
    assert pi == pi_estimation(spark, 200_000, partitions=3)


def test_kmeans_matches_numpy(spark):
    rng = np.random.RandomState(42)
    pts = np.vstack(
        [rng.randn(100, 2) + [0, 0], rng.randn(100, 2) + [8, 8], rng.randn(100, 2) + [0, 8]]
    )
    init = [(0, 1.0, 1.0), (1, 7.0, 7.0), (2, 1.0, 7.0)]
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "px double, py double"
    )
    got = kmeans(df, init, iterations=10)
    want = kmeans_numpy(pts, init, iterations=10)
    for (c1, x1, y1), (c2, x2, y2) in zip(got, want):
        assert c1 == c2
        assert abs(x1 - x2) < 1e-9 and abs(y1 - y2) < 1e-9


def test_logreg_matches_numpy(spark):
    rng = np.random.RandomState(42)
    n, d = 400, 8
    x = rng.randn(n, d)
    true_w = rng.randn(d)
    y = (1.0 / (1.0 + np.exp(-(x @ true_w))) > 0.5).astype(np.float64)
    df = spark.createDataFrame(
        [(x[i].tolist(), float(y[i])) for i in range(n)],
        "features array<double>, label double",
    )
    w_spark = train(df, d, iterations=10, lr=0.5)
    w_np = train_numpy(x, y, iterations=10, lr=0.5)
    np.testing.assert_allclose(w_spark, w_np, rtol=1e-9)
    scored = predict(df, w_spark).collect()
    acc = np.mean([r.pred == yy for r, yy in zip(scored, y)])
    assert acc > 0.8
