"""Gelly ``asm`` package (``flink-gelly/.../graph/asm/``): the reusable
building-block transforms the library algorithms compose — degree
annotation, simplification, degree filtering, and id/value translation.

Spark-first: every annotator is a groupBy + join the optimizer can
fuse/reorder; nothing is iterative. The reference's result/ and
translate/ value-type scaffolding is subsumed by DataFrame schemas and
Column expressions (a translator IS a Column).

Conventions: directed annotators follow
``asm/degree/annotate/directed/*.java`` — ``degree`` counts DISTINCT
neighbors of the symmetrized simple graph, ``out_degree``/``in_degree``
count directed simple edges. Undirected annotators treat the input as
already-symmetrized (``asm/degree/annotate/undirected/*.java`` count
edge source ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gelly_graph import Graph


# -- simplification (asm/simple/) --------------------------------------
def simplify_directed(edges: DataFrame) -> DataFrame:
    """simple/directed/Simplify.java:44-47: drop self-loops, dedup."""
    return (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def simplify_undirected(
    edges: DataFrame, clip_and_flip: bool = False
) -> DataFrame:
    """simple/undirected/Simplify.java:74-113: symmetrize + drop
    self-loops + dedup. ``clip_and_flip`` keeps only src > dst inputs
    before mirroring (discards one-directional edges of an
    inconsistently-symmetrized input instead of repairing them)."""
    e = edges.select("src", "dst")
    kept = e.filter(
        F.col("src") > F.col("dst")
        if clip_and_flip
        else F.col("src") != F.col("dst")
    )
    return (
        kept.unionAll(
            kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    ).distinct()


# -- directed degree annotation (asm/degree/annotate/directed/) --------
def vertex_degrees(edges: DataFrame) -> DataFrame:
    """VertexDegrees.java: (id, degree, out_degree, in_degree) per
    vertex, where degree counts distinct neighbors (a mutual edge pair
    is ONE neighbor)."""
    e = simplify_directed(edges)
    out_d = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    nbr = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        nbr.join(out_d, "id", "left")
        .join(in_d, "id", "left")
        .fillna(0, subset=["out_degree", "in_degree"])
        .select("id", "degree", "out_degree", "in_degree")
    )


def vertex_out_degree(edges: DataFrame) -> DataFrame:
    """VertexOutDegree.java — includes zero-out-degree vertices."""
    e = simplify_directed(edges)
    ids = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    out_d = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    return ids.join(out_d, "id", "left").fillna(0, subset=["out_degree"])


def vertex_in_degree(edges: DataFrame) -> DataFrame:
    """VertexInDegree.java — includes zero-in-degree vertices."""
    return (
        vertex_out_degree(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .withColumnRenamed("out_degree", "in_degree")
    )


def edge_source_degrees(edges: DataFrame) -> DataFrame:
    """EdgeSourceDegrees.java: each edge annotated with its source's
    (degree, out_degree, in_degree)."""
    d = vertex_degrees(edges).select(
        F.col("id").alias("src"),
        F.col("degree").alias("src_degree"),
        F.col("out_degree").alias("src_out_degree"),
        F.col("in_degree").alias("src_in_degree"),
    )
    return edges.join(d, "src")


def edge_target_degrees(edges: DataFrame) -> DataFrame:
    """EdgeTargetDegrees.java."""
    d = vertex_degrees(edges).select(
        F.col("id").alias("dst"),
        F.col("degree").alias("dst_degree"),
        F.col("out_degree").alias("dst_out_degree"),
        F.col("in_degree").alias("dst_in_degree"),
    )
    return edges.join(d, "dst")


def edge_degrees_pair(edges: DataFrame) -> DataFrame:
    """EdgeDegreesPair.java: both endpoints' degree triples."""
    return edge_target_degrees(edge_source_degrees(edges))


# -- undirected degree annotation (asm/degree/annotate/undirected/) ----
def vertex_degree(edges: DataFrame) -> DataFrame:
    """VertexDegree.java: degree per vertex of a symmetrized graph
    (counts out-edges of the simplified input)."""
    e = simplify_directed(edges)
    return e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def edge_source_degree(edges: DataFrame) -> DataFrame:
    d = vertex_degree(edges).select(
        F.col("id").alias("src"), F.col("degree").alias("src_degree")
    )
    return edges.join(d, "src")


def edge_target_degree(edges: DataFrame) -> DataFrame:
    d = vertex_degree(edges).select(
        F.col("id").alias("dst"), F.col("degree").alias("dst_degree")
    )
    return edges.join(d, "dst")


def edge_degree_pair(edges: DataFrame) -> DataFrame:
    return edge_target_degree(edge_source_degree(edges))


# -- degree filtering (asm/degree/filter/undirected/) ------------------
def maximum_degree_filter(graph: Graph, maximum_degree: int) -> Graph:
    """MaximumDegree.java: remove vertices with degree > max, plus
    every incident edge. Vertices filter with an ANTI join against the
    HIGH-degree set (degree > max) — the reference joins vertices
    left-outer against that set and keeps the misses, so isolated
    vertices (no degree row at all) survive; a semi-join against the
    low-degree set would silently drop them. Edges keep the semi-join:
    every endpoint has degree >= 1 by construction."""
    if maximum_degree <= 0:
        raise ValueError("maximum degree must be greater than zero")
    degrees = vertex_degree(graph.edges)
    high = degrees.filter(F.col("degree") > maximum_degree).select("id")
    keep = degrees.filter(F.col("degree") <= maximum_degree).select("id")
    vertices = graph.vertices.join(high, "id", "left_anti")
    edges = graph.edges.join(
        keep.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
    return Graph(vertices, edges.select("src", "dst", "value"))


# -- translation (asm/translate/) --------------------------------------
def translate_graph_ids(graph: Graph, translator) -> Graph:
    """TranslateGraphIds.java: ``translator`` is a callable
    Column → Column (the TranslateFunction), applied to vertex ids and
    both edge endpoints. The reference's shipped translators are
    one-line lambdas here: ``lambda c: c + offset`` =
    LongValueAddOffset.java, ``lambda c: c.cast('string')`` =
    LongValueToStringValue.java, ``lambda c: F.lit(None)`` =
    ToNullValue.java; LongToLongValue / signed / unsigned int casts are
    ``c.cast('long')`` / ``c.cast('int')`` (Spark has no unsigned int —
    the unsigned translator's range check is the caller's cast
    overflow behavior under ANSI mode)."""
    vertices = graph.vertices.select(
        translator(F.col("id")).alias("id"), "value"
    )
    edges = graph.edges.select(
        translator(F.col("src")).alias("src"),
        translator(F.col("dst")).alias("dst"),
        "value",
    )
    return Graph(vertices, edges)


def translate_vertex_values(graph: Graph, translator) -> Graph:
    """TranslateVertexValues.java: callable over the value Column."""
    return Graph(
        graph.vertices.withColumn("value", translator(F.col("value"))),
        graph.edges,
    )


def translate_edge_values(graph: Graph, translator) -> Graph:
    """TranslateEdgeValues.java."""
    return Graph(
        graph.vertices,
        graph.edges.withColumn("value", translator(F.col("value"))),
    )
