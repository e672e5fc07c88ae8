"""Full iterative KMeans (reference: KMeans.java:118-128 — 10-iteration
bulk loop: map points to nearest broadcast centroid, per-centroid
(sum, count) reduce, recompute centroids).

Spark-first shape: the centroid set is tiny, so each iteration
1. unrolls nearest-centroid into a scalar LEAST(struct(d2, cid))
   expression (pure whole-stage-codegen map — no join, no window, no
   shuffle on points; each distance is computed once, so the generated
   code stays small and the per-iteration compile is cheap),
2. aggregates (cid → sum_x, sum_y, count) — one partial+final agg,
3. collects the k-row result to the driver and rebuilds the expression.

This is the standard Spark KMeans pattern at any scale: the per-iteration
shuffle volume is k rows per partition. Points are cached once.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nearest_cid(centroids: list[tuple[int, float, float]]) -> Column:
    """LEAST over struct(d2, cid): struct comparison orders by distance
    first, then cid — equal-distance ties go to the smallest cid, which
    matches NumPy argmin's first-wins when centroids are cid-ascending
    (callers pass them sorted)."""
    structs = []
    for c, x, y in centroids:
        dx = F.col("px") - F.lit(x)
        dy = F.col("py") - F.lit(y)
        structs.append(
            F.struct((dx * dx + dy * dy).alias("d2"), F.lit(c).alias("cid"))
        )
    return F.least(*structs).getField("cid")


def kmeans(
    points: DataFrame,
    init_centroids: list[tuple[int, float, float]],
    iterations: int = 10,
) -> list[tuple[int, float, float]]:
    """Run Lloyd's algorithm; ``points`` needs columns (px, py).
    Returns the final centroid list [(cid, x, y), ...]."""
    from .sizing import sized_shuffle

    with sized_shuffle(points):
        points = points.select("px", "py").persist()
        try:
            cents = list(init_centroids)
            for _ in range(iterations):
                assigned = points.withColumn("cid", _nearest_cid(cents))
                stats = (
                    assigned.groupBy("cid")
                    .agg(
                        F.sum("px").alias("sx"),
                        F.sum("py").alias("sy"),
                        F.count(F.lit(1)).alias("n"),
                    )
                    .collect()
                )
                new = {
                    r["cid"]: (r["sx"] / r["n"], r["sy"] / r["n"]) for r in stats
                }
                # empty clusters keep their previous position (reference
                # semantics: centroid only moves when points are assigned)
                cents = [(c, *(new.get(c, (x, y)))) for c, x, y in cents]
            return cents
        finally:
            points.unpersist()


def kmeans_numpy(
    pts: np.ndarray, init: list[tuple[int, float, float]], iterations: int = 10
) -> list[tuple[int, float, float]]:
    """Golden-oracle reference implementation (CPU, NumPy) — the analog of
    the reference's CPU-Flink rerun used for GPU-vs-CPU comparison."""
    cents = list(init)
    for _ in range(iterations):
        cxy = np.array([[x, y] for _, x, y in cents])
        d2 = ((pts[:, None, :] - cxy[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        out = []
        for i, (c, x, y) in enumerate(cents):
            m = assign == i
            if m.any():
                out.append((c, pts[m, 0].mean(), pts[m, 1].mean()))
            else:
                out.append((c, x, y))
        cents = out
    return cents
