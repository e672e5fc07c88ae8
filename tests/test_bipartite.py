"""BipartiteGraph projections (bipartite/BipartiteGraph.java,
Projection.java) on a hand-computed fixture."""

from __future__ import annotations


def _bg(spark):
    from flink_tornadovm_artifact_spark.functions.bipartite import (
        BipartiteGraph,
    )

    # tops {1,2,3}, bottoms {10,20,30}:
    #   1—10, 1—20, 2—10, 2—20, 3—30
    edges = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 10, "c"), (2, 20, "d"), (3, 30, "e")],
        "top_id long, bottom_id long, value string",
    )
    return BipartiteGraph.from_edges(edges)


def test_projection_top_simple(spark):
    g = _bg(spark).projection_top_simple()
    got = sorted((r.src, r.dst, r.value) for r in g.edges.collect())
    # 1 and 2 share bottoms 10 and 20 (weight 2, both directions);
    # 3 shares nothing
    assert got == [(1, 2, 2), (2, 1, 2)]
    assert sorted(r.id for r in g.vertices.collect()) == [1, 2, 3]


def test_projection_bottom_simple(spark):
    g = _bg(spark).projection_bottom_simple()
    got = sorted((r.src, r.dst, r.value) for r in g.edges.collect())
    # bottoms 10 and 20 share tops 1 and 2
    assert got == [(10, 20, 2), (20, 10, 2)]


def test_projection_top_full(spark):
    rows = _bg(spark).projection_top_full().collect()
    got = sorted(
        (r.src, r.dst, r.shared_id, r.src_edge_value, r.dst_edge_value)
        for r in rows
    )
    # one row per shared bottom vertex, both directions, carrying the
    # original edge values (Projection.java's tuple)
    assert got == [
        (1, 2, 10, "a", "c"),
        (1, 2, 20, "b", "d"),
        (2, 1, 10, "c", "a"),
        (2, 1, 20, "d", "b"),
    ]


def test_projection_bottom_full(spark):
    rows = _bg(spark).projection_bottom_full().collect()
    assert len(rows) == 4
    assert {(r.src, r.dst) for r in rows} == {(10, 20), (20, 10)}


def test_projection_simple_canonical(spark):
    g = _bg(spark).projection_top_simple(canonical=True)
    assert sorted((r.src, r.dst, r.value) for r in g.edges.collect()) == [
        (1, 2, 2)
    ]
