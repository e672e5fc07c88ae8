"""Bipartite graphs (``flink-gelly/.../graph/bipartite/``):
``BipartiteGraph.java`` holds top/bottom vertex sets plus edges that
only connect across the two sets; its four projection methods collapse
one side into a unipartite graph over the other.

Spark-first: the projections are a single self-join of the edge set on
the shared vertex id — the plan you want at 100 TB (one shuffle on the
projection key; the "simple" variants then dedup with a groupBy on the
new edge key). The i != j predicate keeps self-pairs out exactly like
the reference's ``JoinFunction`` which skips equal ids
(BipartiteGraph.java projectionTopSimple/projectionBottomSimple).

Reference semantics:

- ``projection_top_simple``: edge (t1, t2) when both top vertices share
  at least one bottom neighbor; edge value = number of shared bottom
  vertices (the reference emits one edge per shared neighbor and the
  simple projection collapses duplicates — we keep the multiplicity as
  the value, a superset of the reference's NullValue edges).
- ``projection_top_full``: one edge per shared bottom vertex, carrying
  the shared (intermediate) vertex id plus both original edge values —
  ``Projection.java``'s tuple.
- ``projection_bottom_simple`` / ``projection_bottom_full``: the same
  two joins keyed on the top vertex id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gelly_graph import Graph


class BipartiteGraph:
    """``BipartiteGraph.java``. ``top``/``bottom``: (id, value);
    ``edges``: (top_id, bottom_id, value) — value columns optional."""

    def __init__(self, top: DataFrame, bottom: DataFrame, edges: DataFrame):
        if "value" not in top.columns:
            top = top.withColumn("value", F.lit(None))
        if "value" not in bottom.columns:
            bottom = bottom.withColumn("value", F.lit(None))
        if "value" not in edges.columns:
            edges = edges.withColumn("value", F.lit(None))
        self.top = top.select("id", "value")
        self.bottom = bottom.select("id", "value")
        self.edges = edges.select("top_id", "bottom_id", "value")

    @classmethod
    def from_edges(cls, edges: DataFrame) -> "BipartiteGraph":
        """fromDataSet with endpoint-derived vertex sets."""
        top = edges.select(F.col("top_id").alias("id")).distinct()
        bottom = edges.select(F.col("bottom_id").alias("id")).distinct()
        return cls(top, bottom, edges)

    # -- projections ---------------------------------------------------
    def _full(self, shared: str, kept: str) -> DataFrame:
        a = self.edges.select(
            F.col(shared).alias("shared_id"),
            F.col(kept).alias("src"),
            F.col("value").alias("src_edge_value"),
        )
        b = self.edges.select(
            F.col(shared).alias("shared_id"),
            F.col(kept).alias("dst"),
            F.col("value").alias("dst_edge_value"),
        )
        return a.join(b, "shared_id").filter(F.col("src") != F.col("dst"))

    def projection_top_full(self) -> DataFrame:
        """(src, dst, shared_id, src_edge_value, dst_edge_value) — one
        row per bottom vertex the two top vertices share."""
        return self._full("bottom_id", "top_id").select(
            "src", "dst", "shared_id", "src_edge_value", "dst_edge_value"
        )

    def projection_bottom_full(self) -> DataFrame:
        return self._full("top_id", "bottom_id").select(
            "src", "dst", "shared_id", "src_edge_value", "dst_edge_value"
        )

    def projection_top_simple(self, canonical: bool = False) -> Graph:
        """Unipartite graph over the top vertices; edge value = shared
        bottom-neighbor count. ``canonical=True`` keeps only src < dst
        BEFORE the pair aggregation — half the shuffled volume when the
        caller wants each pair once (a deliberate superset of the
        reference, which always emits both orientations)."""
        return Graph(self.top, self._simple("bottom_id", "top_id", canonical))

    def projection_bottom_simple(self, canonical: bool = False) -> Graph:
        return Graph(
            self.bottom, self._simple("top_id", "bottom_id", canonical)
        )

    def _simple(self, shared: str, kept: str, canonical: bool) -> DataFrame:
        pairs = self._full(shared, kept)
        if canonical:
            pairs = pairs.filter(F.col("src") < F.col("dst"))
        return pairs.groupBy("src", "dst").agg(
            F.count(F.lit(1)).alias("value")
        )
