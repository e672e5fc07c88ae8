"""Gelly Graph API facade tests (Graph.java surface): each method's
semantics on a small hand-checked graph — including the edge cases the
reference documents (filterOnVertices drops dangling edges,
filterOnEdges keeps the vertex set, union dedupes vertices but not
edges, difference removes common vertices plus incident edges,
getDegrees counts both directions, degree-0 vertices report 0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.functions.gelly_graph import Graph


def _graph(spark):
    vertices = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id long, value long"
    )
    edges = spark.createDataFrame(
        [(1, 2, 100), (2, 3, 200), (3, 1, 300), (3, 4, 400)],
        "src long, dst long, value long",
    )
    return Graph(vertices, edges)


def test_from_edges_and_counts(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    g = Graph.from_edges(e, vertex_value=F.col("id") * 10)
    assert g.number_of_vertices() == 3 and g.number_of_edges() == 2
    assert {(r.id, r.value) for r in g.vertices.collect()} == {
        (1, 10), (2, 20), (3, 30)
    }


def test_triplets_join_both_endpoint_values(spark):
    g = _graph(spark)
    t = {
        (r.src, r.dst): (r.src_value, r.dst_value, r.edge_value)
        for r in g.get_triplets().collect()
    }
    assert t[(1, 2)] == (10, 20, 100)
    assert t[(3, 4)] == (30, 40, 400)
    assert len(t) == 4


def test_map_and_filter_semantics(spark):
    g = _graph(spark)
    doubled = g.map_vertices(F.col("value") * 2)
    assert {r.value for r in doubled.vertices.collect()} == {20, 40, 60, 80}

    # filterOnVertices: vertex 4 gone -> edge (3,4) gone too
    fv = g.filter_on_vertices(F.col("id") <= 3)
    assert fv.number_of_vertices() == 3
    assert {(r.src, r.dst) for r in fv.edges.collect()} == {
        (1, 2), (2, 3), (3, 1)
    }

    # filterOnEdges: vertex set UNCHANGED (reference semantics)
    fe = g.filter_on_edges(F.col("value") >= 300)
    assert fe.number_of_vertices() == 4
    assert fe.number_of_edges() == 2


def test_reverse_and_undirected(spark):
    g = _graph(spark)
    assert {(r.src, r.dst) for r in g.reverse().edges.collect()} == {
        (2, 1), (3, 2), (1, 3), (4, 3)
    }
    assert g.get_undirected().number_of_edges() == 8  # duplicates kept


def test_union_difference_intersect(spark):
    g = _graph(spark)
    other = Graph(
        spark.createDataFrame([(3, 99), (5, 50)], "id long, value long"),
        spark.createDataFrame([(3, 5, 500), (1, 2, 100)], "src long, dst long, value long"),
    )
    u = g.union(other)
    # vertex 3 deduped with THIS graph's value winning; edges concatenate
    assert {(r.id, r.value) for r in u.vertices.collect()} == {
        (1, 10), (2, 20), (3, 30), (4, 40), (5, 50)
    }
    assert u.number_of_edges() == 6  # (1,2) duplicated, as in the reference

    d = g.difference(other)  # drops common vertex 3 and its edges
    assert {r.id for r in d.vertices.collect()} == {1, 2, 4}
    assert {(r.src, r.dst) for r in d.edges.collect()} == {(1, 2)}

    i = g.intersect(other)  # only (1,2) in both
    assert {(r.src, r.dst) for r in i.edges.collect()} == {(1, 2)}
    assert {r.id for r in i.vertices.collect()} == {1, 2}


def test_mutations(spark):
    g = _graph(spark)
    g2 = g.add_vertices(
        spark.createDataFrame([(4, 999), (9, 90)], "id long, value long")
    )
    got = {(r.id, r.value) for r in g2.vertices.collect()}
    assert (4, 40) in got and (9, 90) in got  # existing id kept its value

    g3 = g.remove_vertices(spark.createDataFrame([(3,)], "id long"))
    assert {r.id for r in g3.vertices.collect()} == {1, 2, 4}
    assert {(r.src, r.dst) for r in g3.edges.collect()} == {(1, 2)}

    g4 = g.remove_edges(spark.createDataFrame([(1, 2)], "src long, dst long"))
    assert g4.number_of_edges() == 3 and g4.number_of_vertices() == 4


def test_degrees(spark):
    g = _graph(spark)
    iso = g.add_vertices(spark.createDataFrame([(9, 90)], "id long, value long"))
    out_d = {r.id: r.degree for r in iso.out_degrees().collect()}
    in_d = {r.id: r.degree for r in iso.in_degrees().collect()}
    both = {r.id: r.degree for r in iso.get_degrees().collect()}
    assert out_d == {1: 1, 2: 1, 3: 2, 4: 0, 9: 0}
    assert in_d == {1: 1, 2: 1, 3: 1, 4: 1, 9: 0}
    assert both == {1: 2, 2: 2, 3: 3, 4: 1, 9: 0}


def test_run_library_algorithm(spark):
    from flink_tornadovm_artifact_spark.functions.graph import (
        connected_components,
    )

    g = _graph(spark)
    got = {r.vertex: r.component for r in g.run(connected_components).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_run_dispatches_k_core(spark):
    """k-core (the beyond-reference graph-curation peel) is reachable
    through the same GraphAlgorithm.run facade as the shipped library
    (round-7 wiring): run() hands the full edge list; the peel ignores
    the value column."""
    from flink_tornadovm_artifact_spark.functions.graph import k_core

    # K4 plus a pendant path — the path peels away at k=3
    g = Graph(
        spark.createDataFrame([(i, 0) for i in range(1, 7)], "id long, value long"),
        spark.createDataFrame(
            [(1, 2, 0), (1, 3, 0), (1, 4, 0), (2, 3, 0), (2, 4, 0),
             (3, 4, 0), (4, 5, 0), (5, 6, 0)],
            "src long, dst long, value long",
        ),
    )
    got = sorted(r.vertex for r in g.run(k_core, k=3).collect())
    assert got == [1, 2, 3, 4]


def test_run_weighted_algorithm_sees_edge_values(spark):
    """run() must hand the algorithm the FULL edge list so weighted
    library algorithms (sssp reads `weight`) work through the facade."""
    from flink_tornadovm_artifact_spark.functions.graph import sssp

    g = Graph(
        spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "id long, value long"),
        spark.createDataFrame(
            [(1, 2, 5), (2, 3, 7), (1, 3, 20)], "src long, dst long, value long"
        ),
    )
    got = {
        r.vertex: r.distance
        for r in g.run(
            lambda e, **kw: sssp(e.withColumnRenamed("value", "weight"), **kw),
            source=1,
        ).collect()
    }
    assert got == {1: 0, 2: 5, 3: 12}


def test_validate_vertex_ids(spark):
    """InvalidVertexIdsValidator: edges referencing a vertex missing
    from the vertex set fail validation."""
    from flink_tornadovm_artifact_spark.functions.gelly_graph import (
        Graph,
        validate_vertex_ids,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    ok = Graph.from_edges(edges)
    assert validate_vertex_ids(ok)
    clipped = Graph(
        ok.vertices.filter("id != 3"), ok.edges
    )
    assert not validate_vertex_ids(clipped)
