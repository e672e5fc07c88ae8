"""Gelly ``Graph`` API facade (``flink-gelly/.../graph/Graph.java``):
the user-facing graph abstraction the library algorithms run on —
vertex/edge DataSets with transformation, mutation, set-op, degree and
triplet methods.

Spark-first: a ``Graph`` is two DataFrames — ``vertices (id, value)``
and ``edges (src, dst, value)`` — and every method is the DataFrame
expression a user would write by hand; nothing materializes until an
action. Column-expression callbacks replace the reference's map/filter
function objects (staying JVM-side, never per-row Python). Reference
methods with a Spark-native spelling keep the Gelly name for
discoverability (``number_of_vertices`` = ``vertices.count()``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Graph:
    """Immutable vertex/edge pair (Graph.java). ``vertices``:
    (id, value); ``edges``: (src, dst, value) — value columns optional,
    filled with nulls when absent."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        if "value" not in vertices.columns:
            vertices = vertices.withColumn("value", F.lit(None))
        if "value" not in edges.columns:
            edges = edges.withColumn("value", F.lit(None))
        self.vertices = vertices.select("id", "value")
        self.edges = edges.select("src", "dst", "value")

    # -- constructors (Graph.fromDataSet / fromCollection) ------------
    @classmethod
    def from_edges(cls, edges: DataFrame, vertex_value=None) -> "Graph":
        """Graph.fromDataSet(edges, mapper): vertices are the distinct
        endpoint ids, valued by the optional ``vertex_value`` Column
        expression over ``id`` (the reference's vertex initializer)."""
        ids = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        vertices = ids.withColumn(
            "value", vertex_value if vertex_value is not None else F.lit(None)
        )
        return cls(vertices, edges)

    # -- accessors ----------------------------------------------------
    def get_vertex_ids(self) -> DataFrame:
        return self.vertices.select("id")

    def get_triplets(self) -> DataFrame:
        """Triplet view (src id/value, edge value, dst id/value) —
        Graph.getTriplets: two joins against the vertex set."""
        sv = self.vertices.select(
            F.col("id").alias("src"), F.col("value").alias("src_value")
        )
        tv = self.vertices.select(
            F.col("id").alias("dst"), F.col("value").alias("dst_value")
        )
        return (
            self.edges.withColumnRenamed("value", "edge_value")
            .join(sv, "src")
            .join(tv, "dst")
            .select("src", "src_value", "dst", "dst_value", "edge_value")
        )

    def number_of_vertices(self) -> int:
        return self.vertices.count()

    def number_of_edges(self) -> int:
        return self.edges.count()

    # -- transformations ----------------------------------------------
    def map_vertices(self, value: Column) -> "Graph":
        """mapVertices: new vertex value as a Column over (id, value)."""
        return Graph(self.vertices.withColumn("value", value), self.edges)

    def map_edges(self, value: Column) -> "Graph":
        return Graph(self.vertices, self.edges.withColumn("value", value))

    def filter_on_vertices(self, pred: Column) -> "Graph":
        """filterOnVertices: keep matching vertices; edges survive only
        when BOTH endpoints remain (two semi-joins, no row explosion)."""
        keep = self.vertices.filter(pred)
        ids = keep.select("id")
        edges = self.edges.join(
            ids.withColumnRenamed("id", "src"), "src", "left_semi"
        ).join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        return Graph(keep, edges.select("src", "dst", "value"))

    def filter_on_edges(self, pred: Column) -> "Graph":
        """filterOnEdges: vertex set unchanged (reference semantics)."""
        return Graph(self.vertices, self.edges.filter(pred))

    def subgraph(self, vertex_pred: Column, edge_pred: Column) -> "Graph":
        return self.filter_on_vertices(vertex_pred).filter_on_edges(edge_pred)

    def reverse(self) -> "Graph":
        return Graph(
            self.vertices,
            self.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "value"
            ),
        )

    def get_undirected(self) -> "Graph":
        """getUndirected: every edge plus its reversal (the reference
        keeps duplicates; algorithms dedupe as needed)."""
        return Graph(self.vertices, self.edges.unionByName(self.reverse().edges))

    # -- set operations -----------------------------------------------
    def union(self, other: "Graph") -> "Graph":
        """Graph.union: vertex sets merge with duplicates removed (by
        id, this graph's value wins); edge sets concatenate WITH
        duplicates, as in the reference."""
        merged_v = self.vertices.unionByName(
            other.vertices.join(
                self.vertices.select("id"), "id", "left_anti"
            )
        )
        return Graph(merged_v, self.edges.unionByName(other.edges))

    def difference(self, other: "Graph") -> "Graph":
        """Graph.difference: removeVertices(other.vertices) — drops the
        common vertices and every edge touching them."""
        keep = self.vertices.join(
            other.vertices.select("id"), "id", "left_anti"
        )
        ids = keep.select("id")
        edges = self.edges.join(
            ids.withColumnRenamed("id", "src"), "src", "left_semi"
        ).join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        return Graph(keep, edges.select("src", "dst", "value"))

    def intersect(self, other: "Graph") -> "Graph":
        """Graph.intersect (distinct-edge mode): edges present in both
        graphs pairwise; vertices derived from the surviving edges with
        null values (the reference returns NullValue vertex values)."""
        mine = self.edges.select("src", "dst").distinct()
        theirs = other.edges.select("src", "dst").distinct()
        common = mine.join(theirs, ["src", "dst"], "left_semi").withColumn(
            "value", F.lit(None)
        )
        return Graph.from_edges(common)

    # -- mutations ----------------------------------------------------
    def add_vertices(self, vertices: DataFrame) -> "Graph":
        """addVertices: existing ids keep their current value."""
        fresh = vertices.join(self.vertices.select("id"), "id", "left_anti")
        return Graph(self.vertices.unionByName(fresh.select("id", "value")), self.edges)

    def add_edges(self, edges: DataFrame) -> "Graph":
        return Graph(self.vertices, self.edges.unionByName(edges.select("src", "dst", "value")))

    def remove_vertices(self, ids: DataFrame) -> "Graph":
        keep = self.vertices.join(ids.select("id"), "id", "left_anti")
        kid = keep.select("id")
        edges = self.edges.join(
            kid.withColumnRenamed("id", "src"), "src", "left_semi"
        ).join(kid.withColumnRenamed("id", "dst"), "dst", "left_semi")
        return Graph(keep, edges.select("src", "dst", "value"))

    def remove_edges(self, edges: DataFrame) -> "Graph":
        return Graph(
            self.vertices,
            self.edges.join(edges.select("src", "dst"), ["src", "dst"], "left_anti"),
        )

    # -- degrees ------------------------------------------------------
    def out_degrees(self) -> DataFrame:
        """outDegrees — vertices with no out-edges report 0 (the
        reference joins degrees back onto the vertex set)."""
        d = self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        return self.vertices.select("id").join(d, "id", "left").select(
            "id", F.coalesce("degree", F.lit(0)).alias("degree")
        )

    def in_degrees(self) -> DataFrame:
        d = self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        return self.vertices.select("id").join(d, "id", "left").select(
            "id", F.coalesce("degree", F.lit(0)).alias("degree")
        )

    def get_degrees(self) -> DataFrame:
        """getDegrees = in + out (counts both directions of any edge)."""
        both = self.edges.select(F.col("src").alias("id")).unionAll(
            self.edges.select(F.col("dst").alias("id"))
        )
        d = both.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
        return self.vertices.select("id").join(d, "id", "left").select(
            "id", F.coalesce("degree", F.lit(0)).alias("degree")
        )

    # -- algorithms ---------------------------------------------------
    def run(self, algorithm, *args, **kwargs):
        """GraphAlgorithm.run analog: apply a library function from
        ``functions.graph`` to this graph's FULL edge list — the value
        column rides along (Gelly passes the whole graph, and weighted
        algorithms like sssp read the edge value; unweighted ones select
        src/dst and ignore it)."""
        return algorithm(self.edges, *args, **kwargs)


def checksum_hash_code(graph: Graph) -> DataFrame:
    """Graph checksum (``flink-gelly/.../library/metric/
    ChecksumHashCode.java`` over ``asm/dataset/ChecksumHashCode.java``):
    one row (count, checksum) where count = |V| + |E| and checksum is
    the sum over elements of an unsigned 32-bit row hash — the same
    order-independent fingerprint contract as the reference (its
    accumulator sums ``record.hashCode() & 0xffffffff``). The hash
    function itself is Spark's Murmur3 ``F.hash`` rather than Java's
    ``Tuple.hashCode`` — checksums are comparable between runs of THIS
    engine (the fingerprint's purpose), not bit-equal to Flink's.
    """
    mask = F.lit(0xFFFFFFFF).cast("long")
    parts = [
        graph.vertices.select(
            (F.hash(*graph.vertices.columns).cast("long")
             .bitwiseAND(mask)).alias("h")
        ),
        graph.edges.select(
            (F.hash(*graph.edges.columns).cast("long")
             .bitwiseAND(mask)).alias("h")
        ),
    ]
    allh = parts[0].unionAll(parts[1])
    return allh.agg(
        F.count(F.lit(1)).alias("count"), F.sum("h").alias("checksum")
    )


def validate_vertex_ids(graph: Graph) -> bool:
    """``validation/InvalidVertexIdsValidator.java`` (the one shipped
    ``GraphValidator``): true iff every edge endpoint id appears in the
    vertex set. Two anti-joins against the vertex ids — each a
    broadcast-able semi-join shape, no row explosion — then an
    emptiness probe (the reference coGroups and collects the first
    invalid id; ``isEmpty`` is Spark's LIMIT-1 short-circuit form of
    the same check)."""
    ids = graph.vertices.select("id")
    bad_src = graph.edges.join(
        ids.withColumnRenamed("id", "src"), "src", "left_anti"
    )
    bad_dst = graph.edges.join(
        ids.withColumnRenamed("id", "dst"), "dst", "left_anti"
    )
    return bad_src.isEmpty() and bad_dst.isEmpty()
