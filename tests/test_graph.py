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


def test_sssp_hand_computed(spark):
    """Gelly SingleSourceShortestPaths semantics: min-distance delta
    iteration, only reachable vertices returned. Expected distances
    worked out by hand (Dijkstra on paper), including a vertex whose
    first-found distance is later improved via a longer-hop cheaper
    path — the min-merge/workset update must handle the revision."""
    from flink_tornadovm_artifact_spark.functions.graph import sssp

    edges = [
        # direct expensive edge 0->3 (10) vs cheap 3-hop path (1+1+1)
        (0, 3, 10),
        (0, 1, 1),
        (1, 2, 1),
        (2, 3, 1),
        (3, 4, 2),
        # unreachable island
        (7, 8, 1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.vertex: r.distance for r in sssp(df, source=0).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 5}


def test_sssp_converges_before_iteration_cap(spark):
    """The delta iteration must reach the true fixpoint (workset empties)
    well inside sssp_pipeline's max_iterations on the pipeline graph —
    otherwise the oracle's unrolled Bellman-Ford depth and the Spark
    result could silently diverge at another SF."""
    from flink_tornadovm_artifact_spark.queries.procedural import (
        _sssp_edges,
        _SSSP_SOURCE,
    )
    from flink_tornadovm_artifact_spark.functions.graph import sssp

    from .conftest import SF_SMOKE

    e = _sssp_edges(spark, SF_SMOKE)
    full = sssp(e, source=_SSSP_SOURCE, max_iterations=30)
    capped = sssp(e, source=_SSSP_SOURCE, max_iterations=18)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, capped.collect())
    )
