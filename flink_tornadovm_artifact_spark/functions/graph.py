"""Graph pipelines: PageRank (bulk iteration), ConnectedComponents and
SingleSourceShortestPaths (delta iteration) — reference examples
``graph/PageRank.java``, ``graph/ConnectedComponents.java`` and the
Gelly library algorithm ``flink-gelly/.../library/
SingleSourceShortestPaths.java`` (DataSet.iterate / iterateDelta,
SURVEY.md §2.F).

Spark-first shape: pure DataFrame joins + aggregations per superstep,
``localCheckpoint`` per iteration to truncate lineage. Edges shuffle on
src/dst — at scale, pre-partition the edge table on src
(``repartition("src")``) so every superstep reuses the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sizing import sized_shuffle as _sized_shuffle


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an edge list (src long, dst long). Returns
    (vertex, rank). Dangling vertices keep the teleport mass."""
    with _sized_shuffle(edges):
        vertices = (
            edges.select(F.col("src").alias("vertex"))
            .union(edges.select(F.col("dst").alias("vertex")))
            .distinct()
            .persist()
        )
        n = vertices.count()
        out_deg = (
            edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
        )
        ranks = vertices.withColumn("rank", F.lit(1.0 / n))
        for _ in range(iterations):
            contribs = (
                edges.join(ranks, edges.src == ranks.vertex)
                .join(out_deg, "src")
                .select(
                    F.col("dst").alias("vertex"),
                    (F.col("rank") / F.col("deg")).alias("c"),
                )
                .groupBy("vertex")
                .agg(F.sum("c").alias("inflow"))
            )
            ranks = (
                vertices.join(contribs, "vertex", "left")
                .select(
                    "vertex",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
        vertices.unpersist()
        out_deg.unpersist()
        return ranks


def connected_components(edges: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Delta-iteration label propagation (ConnectedComponents.java):
    solution = (vertex, component); workset = vertices whose label
    changed last round. Terminates when the workset empties. Returns
    (vertex, component) with component = min vertex id in the component."""
    with _sized_shuffle(edges):
        und = (
            edges.select("src", "dst")
            .union(
                edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .distinct()
            .persist()
        )
        solution = (
            und.select(F.col("src").alias("vertex"))
            .distinct()
            .withColumn("component", F.col("vertex"))
            .localCheckpoint(eager=True)
        )
        workset = solution
        for _ in range(max_iterations):
            # candidate labels flowing across edges from changed vertices
            candidates = (
                und.join(workset, und.src == workset.vertex)
                .select(
                    F.col("dst").alias("vertex"),
                    F.col("component").alias("cand"),
                )
                .groupBy("vertex")
                .agg(F.min("cand").alias("cand"))
            )
            joined = solution.join(candidates, "vertex", "left")
            new_solution = joined.select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("cand", F.col("component"))
                ).alias("component"),
            ).localCheckpoint(eager=True)
            workset = (
                new_solution.alias("n")
                .join(solution.alias("o"), "vertex")
                .filter(F.col("n.component") < F.col("o.component"))
                .select("vertex", F.col("n.component").alias("component"))
                .localCheckpoint(eager=True)
            )
            solution = new_solution
            if workset.isEmpty():
                break
        und.unpersist()
        return solution


def sssp(
    edges: DataFrame, source: int, max_iterations: int = 50
) -> DataFrame:
    """Single-source shortest paths via delta iteration — the Gelly
    library algorithm (``flink-gelly/.../library/
    SingleSourceShortestPaths.java``: scatter-gather min-distance
    propagation, which Gelly runs on the same delta-iteration runtime as
    ConnectedComponents).

    ``edges``: (src long, dst long, weight long), directed, positive
    weights. Returns (vertex, distance) for every vertex REACHABLE from
    ``source`` (Gelly reports unreachable vertices as +inf; the finite
    rows are identical, and a bigint distance keeps the oracle exact —
    no float summation-order drift).

    Delta-iteration shape, matching connected_components above: the
    per-round join touches only the WORKSET (vertices improved last
    round), not the full solution — the work per superstep shrinks as the
    frontier converges, exactly Flink's workset optimization. Each round
    is one shuffle on the edge key plus a min-merge groupBy; lineage is
    truncated per round with localCheckpoint.
    """
    with _sized_shuffle(edges):
        e = edges.select("src", "dst", "weight").persist()
        solution = (
            e.sparkSession.createDataFrame(
                [(source, 0)], "vertex long, distance long"
            )
            .localCheckpoint(eager=True)
        )
        workset = solution
        for _ in range(max_iterations):
            candidates = (
                e.join(workset, e.src == workset.vertex)
                .select(
                    F.col("dst").alias("vertex"),
                    (F.col("distance") + F.col("weight")).alias("cand"),
                )
                .groupBy("vertex")
                .agg(F.min("cand").alias("cand"))
            )
            improved = (
                candidates.join(solution, "vertex", "left")
                .filter(
                    F.col("distance").isNull()
                    | (F.col("cand") < F.col("distance"))
                )
                .select("vertex", F.col("cand").alias("distance"))
                .localCheckpoint(eager=True)
            )
            if improved.isEmpty():
                break
            # solution-set update: keep the min distance per vertex
            solution = (
                solution.unionByName(improved)
                .groupBy("vertex")
                .agg(F.min("distance").alias("distance"))
                .localCheckpoint(eager=True)
            )
            workset = improved
        e.unpersist()
        return solution
