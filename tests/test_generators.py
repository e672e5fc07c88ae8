"""Graph generator structural tests: closed-form vertex/edge counts and
degree properties per the reference constructions
(flink-gelly/.../graph/generator/*.java), plus library integration
(triangle counts on complete graphs) and RMat determinism/skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.functions.generators import (
    circulant_graph,
    complete_graph,
    cycle_graph,
    echo_graph,
    empty_graph,
    grid_graph,
    hypercube_graph,
    path_graph,
    rmat_graph,
    singleton_edge_graph,
    star_graph,
)


def _out_degrees(g):
    """id → out-degree for every vertex (0 for isolated)."""
    d = g.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    rows = (
        g.vertices.select("id")
        .join(d, "id", "left")
        .fillna(0, subset=["deg"])
        .collect()
    )
    return {r.id: r.deg for r in rows}


def _edge_set(g):
    return {(r.src, r.dst) for r in g.edges.collect()}


def test_complete_graph(spark):
    g = complete_graph(spark, 5)
    assert g.number_of_vertices() == 5
    assert g.number_of_edges() == 5 * 4
    assert set(_out_degrees(g).values()) == {4}
    assert _edge_set(g) == {
        (u, v) for u in range(5) for v in range(5) if u != v
    }


def test_complete_graph_triangles(spark):
    """Library integration: K6 has C(6,3) = 20 triangles."""
    from flink_tornadovm_artifact_spark.functions.graph import triangles

    g = complete_graph(spark, 6)
    assert triangles(g.edges.select("src", "dst")).count() == 20


def test_cycle_and_path_graphs(spark):
    cyc = cycle_graph(spark, 6)
    assert cyc.number_of_edges() == 12
    assert set(_out_degrees(cyc).values()) == {2}
    assert (1, 2) in _edge_set(cyc) and (0, 5) in _edge_set(cyc)

    p = path_graph(spark, 5)
    assert p.number_of_edges() == 8
    degs = _out_degrees(p)
    assert degs[0] == degs[4] == 1 and degs[1] == degs[2] == degs[3] == 2


def test_grid_graph_2x3(spark):
    """2x3 unwrapped grid: ids row-major (first dimension most
    significant, increment = 3 then 1)."""
    g = grid_graph(spark, [(2, False), (3, False)])
    assert g.number_of_vertices() == 6
    # undirected edge pairs: 3 vertical + 4 horizontal = 7 → 14 directed
    assert g.number_of_edges() == 14
    es = _edge_set(g)
    assert (0, 3) in es and (3, 0) in es  # vertical
    assert (0, 1) in es and (1, 2) in es and (2, 1) in es
    assert (0, 2) not in es and (2, 3) not in es


def test_grid_graph_size2_wrap_dropped(spark):
    """GridGraph.java:78: wrap on a size-2 dimension is a no-op, not a
    doubled edge."""
    a = grid_graph(spark, [(2, True)])
    b = grid_graph(spark, [(2, False)])
    assert _edge_set(a) == _edge_set(b) == {(0, 1), (1, 0)}


def test_hypercube_graph(spark):
    g = hypercube_graph(spark, 3)
    assert g.number_of_vertices() == 8
    assert g.number_of_edges() == 24
    # every neighbor differs in exactly one bit
    assert all(
        bin(s ^ d).count("1") == 1 for s, d in _edge_set(g)
    )
    assert set(_out_degrees(g).values()) == {3}


def test_star_graph(spark):
    g = star_graph(spark, 5)
    assert g.number_of_edges() == 8
    degs = _out_degrees(g)
    assert degs[0] == 4 and all(degs[i] == 1 for i in range(1, 5))


def test_empty_and_singleton_graphs(spark):
    e = empty_graph(spark, 4)
    assert e.number_of_vertices() == 4 and e.number_of_edges() == 0

    s = singleton_edge_graph(spark, 3)
    assert s.number_of_vertices() == 6
    assert _edge_set(s) == {
        (0, 1), (1, 0), (2, 3), (3, 2), (4, 5), (5, 4)
    }


def test_echo_graph(spark):
    """EchoGraph(6,3) = circulant offsets {2,3,4}: 3-regular and
    symmetric (offset set is its own mod-6 complement)."""
    g = echo_graph(spark, 6, 3)
    es = _edge_set(g)
    assert len(es) == 18
    assert set(_out_degrees(g).values()) == {3}
    assert all((d, s) in es for s, d in es)
    with pytest.raises(ValueError, match="even"):
        echo_graph(spark, 6, 2)


def test_circulant_validation(spark):
    with pytest.raises(ValueError, match="overlapping"):
        circulant_graph(spark, 10, [(1, 3), (2, 2)])
    with pytest.raises(ValueError, match="offset must be at least 1"):
        circulant_graph(spark, 10, [(0, 2)])
    with pytest.raises(ValueError, match="vertex count minus"):
        circulant_graph(spark, 10, [(8, 5)])


def test_rmat_graph_deterministic_and_skewed(spark):
    g1 = rmat_graph(spark, scale=6, edge_count=512, seed=7)
    g2 = rmat_graph(spark, scale=6, edge_count=512, seed=7)
    assert g1.number_of_vertices() == 64
    assert g1.edges.count() == 512  # multigraph: duplicates allowed
    e1 = sorted((r.src, r.dst) for r in g1.edges.collect())
    e2 = sorted((r.src, r.dst) for r in g2.edges.collect())
    assert e1 == e2
    assert all(0 <= s < 64 and 0 <= d < 64 for s, d in e1)
    # a different seed moves the graph
    e3 = sorted(
        (r.src, r.dst)
        for r in rmat_graph(spark, 6, 512, seed=8).edges.collect()
    )
    assert e3 != e1
    # power-law skew: the hottest source exceeds the uniform mean (8)
    # by a wide margin under the Graph500 parameters
    top = (
        g1.edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    )
    assert top >= 24
