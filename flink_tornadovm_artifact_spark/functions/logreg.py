"""Logistic regression training (reference: LogisticRegression.java:71-88 —
10-iteration SGD loop of 4 chained map/reduce stages over
Tuple2<double[], Double> rows with broadcast weights).

Spark-first shape: full-batch gradient descent where each iteration is ONE
distributed pass — an Arrow-batched partial-gradient kernel per partition
(the reference's accelerated map/reduce pair collapsed into one stage)
followed by a d+1-element driver-side reduce. Weights are broadcast each
iteration, mirroring the reference's withBroadcastSet weight feed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def train(
    data: DataFrame,
    dim: int,
    iterations: int = 10,
    lr: float = 0.1,
    features_col: str = "features",
    label_col: str = "label",
) -> np.ndarray:
    """Full-batch GD; ``data`` columns: features array<double>, label
    double. Returns the learned weight vector (length dim)."""
    from .sizing import sized_shuffle

    with sized_shuffle(data):
        return _train_loop(data, dim, iterations, lr, features_col, label_col)


def _train_loop(data, dim, iterations, lr, features_col, label_col):
    data = data.select(features_col, label_col).persist()
    sc = data.sparkSession.sparkContext
    try:
        w = np.zeros(dim, dtype=np.float64)
        n = data.count()
        for _ in range(iterations):
            bw = sc.broadcast(w)

            def partials(pdfs):
                ww = bw.value
                for pdf in pdfs:
                    if len(pdf) == 0:
                        continue
                    x = np.stack(pdf[features_col].to_numpy())
                    y = pdf[label_col].to_numpy()
                    err = _sigmoid(x @ ww) - y
                    yield pd.DataFrame({"grad": [(x.T @ err).tolist()]})

            rows = data.mapInPandas(partials, "grad array<double>").collect()
            grad = np.sum([np.asarray(r["grad"]) for r in rows], axis=0)
            w = w - lr * grad / n
            bw.destroy()
        return w
    finally:
        data.unpersist()


def train_numpy(
    x: np.ndarray, y: np.ndarray, iterations: int = 10, lr: float = 0.1
) -> np.ndarray:
    """Golden-oracle NumPy implementation (same math, single machine)."""
    w = np.zeros(x.shape[1], dtype=np.float64)
    n = len(y)
    for _ in range(iterations):
        grad = x.T @ (_sigmoid(x @ w) - y)
        w = w - lr * grad / n
    return w


def predict(data: DataFrame, w: np.ndarray, features_col: str = "features") -> DataFrame:
    """Score rows with the learned weights (reference predict+evaluate)."""
    sc = data.sparkSession.sparkContext
    bw = sc.broadcast(np.asarray(w))

    def scorer(pdfs):
        ww = bw.value
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[features_col].to_numpy())
            p = _sigmoid(x @ ww)
            yield pd.DataFrame({"p": p, "pred": (p >= 0.5).astype("float64")})

    return data.mapInPandas(scorer, "p double, pred double")
