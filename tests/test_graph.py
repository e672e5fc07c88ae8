"""Graph pipeline tests: PageRank vs NumPy power iteration;
ConnectedComponents vs union-find."""

from __future__ import annotations

import numpy as np

from flink_tornadovm_artifact_spark.functions.graph import (
    connected_components,
    pagerank,
)


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_matches_numpy(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    df = _edges_df(spark, edges)
    got = {r.vertex: r.rank for r in pagerank(df, iterations=15).collect()}

    n = 4
    M = np.zeros((n, n))
    outdeg = {}
    for s, d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    for s, d in edges:
        M[d, s] = 1.0 / outdeg[s]
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        r = (1 - 0.85) / n + 0.85 * (M @ r)
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-9, (v, got[v], r[v])


def test_connected_components(spark):
    # two components: {0,1,2,3} and {10,11}; singleton via self edge {20}
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (20, 20)]
    df = _edges_df(spark, edges)
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20}
