"""Gelly's three vertex-centric iteration models as generic operators:

- ``gather_sum_apply_iteration``  — gsa/GatherSumApplyIteration.java
  (gather a partial per in-neighbor, sum per vertex, apply update)
- ``scatter_gather_iteration``    — spargel/ScatterGatherIteration.java
  (scatter messages along edges, gather to update vertex state)
- ``vertex_centric_iteration``    — pregel/VertexCentricIteration.java
  (user compute step consumes messages and emits messages)

Spark-first: each superstep is one keyed join (edges x active state) +
one keyed aggregation — the same delta-iteration shape proven by
``graph.connected_components``/``sssp`` (which ARE the GSA
decompositions of those algorithms; this module is the user-facing
generic form). The callbacks are Column expressions / DataFrame
transforms, never per-row Python, so every superstep stays in
whole-stage codegen. ``localCheckpoint`` per round cuts the unrolled
lineage (the 100 TB discipline: plan size must not grow with
iteration count); convergence checks run on the workset, which shrinks
as the fixpoint approaches — Flink's workset optimization.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _symmetrized(edges: DataFrame, direction: str) -> DataFrame:
    e = edges.select("src", "dst", "value") if "value" in edges.columns else (
        edges.select("src", "dst").withColumn("value", F.lit(None))
    )
    if direction == "out":
        return e
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "value"
    )
    if direction == "in":
        return rev
    if direction == "all":
        return e.unionAll(rev)
    raise ValueError(f"unknown direction {direction!r}")


def gather_sum_apply_iteration(
    edges: DataFrame,
    vertices: DataFrame,
    gather: Callable[[Column, Column], Column],
    sum_agg: Callable[[Column], Column],
    apply_fn: Callable[[Column, Column], Column],
    max_iterations: int,
) -> DataFrame:
    """GatherSumApplyIteration.java: per superstep, every edge gathers
    a partial from its SOURCE vertex value (``gather(src_value,
    edge_value)``), partials are reduced per TARGET vertex with
    ``sum_agg``, and ``apply_fn(old_value, summed)`` produces the new
    value. Terminates when no vertex value changes (the reference's
    delta-based termination) or after ``max_iterations``.

    ``vertices``: (id, value) initial state. Returns (id, value)."""
    e = _symmetrized(edges, "out").persist()
    solution = vertices.select("id", "value").localCheckpoint(eager=True)
    workset = solution
    for _ in range(max_iterations):
        partials = e.join(
            workset.select(
                F.col("id").alias("src"), F.col("value").alias("src_value")
            ),
            "src",
        ).select(
            F.col("dst").alias("id"),
            gather(F.col("src_value"), F.col("value")).alias("partial"),
        )
        summed = partials.groupBy("id").agg(
            sum_agg(F.col("partial")).alias("summed")
        )
        joined = solution.join(summed, "id", "left")
        new_solution = joined.select(
            "id",
            F.when(
                F.col("summed").isNull(), F.col("value")
            )
            .otherwise(apply_fn(F.col("value"), F.col("summed")))
            .alias("value"),
        ).localCheckpoint(eager=True)
        workset = (
            new_solution.alias("n")
            .join(solution.alias("o"), "id")
            .filter(~F.col("n.value").eqNullSafe(F.col("o.value")))
            .select("id", F.col("n.value").alias("value"))
            .localCheckpoint(eager=True)
        )
        solution = new_solution
        if workset.isEmpty():
            break
    e.unpersist()
    return solution


def scatter_gather_iteration(
    edges: DataFrame,
    vertices: DataFrame,
    scatter: Callable[[Column, Column], Column],
    gather_agg: Callable[[Column], Column],
    update: Callable[[Column, Column], Column],
    max_iterations: int,
    direction: str = "out",
) -> DataFrame:
    """ScatterGatherIteration.java: ``scatter(vertex_value,
    edge_value)`` builds the message each vertex sends along its edges
    (``direction``: 'out' | 'in' | 'all' =
    ScatterGatherConfiguration.setDirection); messages are combined
    per receiver with ``gather_agg`` and ``update(old, combined)``
    produces the new value — only vertices that RECEIVED a message
    update, per the reference's GatherFunction contract.

    Structurally this is gather-sum-apply with the callback split
    moved from the edge to the sender — the reference documents the
    same equivalence (both are implemented on delta iterations)."""
    return gather_sum_apply_iteration(
        _symmetrized(edges, direction),
        vertices,
        scatter,
        gather_agg,
        update,
        max_iterations,
    )


def vertex_centric_iteration(
    vertices: DataFrame,
    initial_messages: DataFrame,
    compute: Callable[[int, DataFrame, DataFrame], tuple[DataFrame, DataFrame]],
    max_supersteps: int,
) -> DataFrame:
    """VertexCentricIteration.java (Pregel): ``compute(superstep,
    vertices, messages) -> (new_vertices, new_messages)`` — the user
    step consumes this round's (id, message) rows and emits the next
    round's, exactly ComputeFunction.compute's contract lifted to
    DataFrames (message combining — MessageCombiner.java — is any
    groupBy the caller puts inside ``compute``). Terminates when no
    messages remain — Pregel's global halt — or at
    ``max_supersteps``. Returns the final (id, value) state."""
    solution = vertices.select("id", "value").localCheckpoint(eager=True)
    messages = initial_messages
    for superstep in range(max_supersteps):
        if messages.isEmpty():
            break
        solution, messages = compute(superstep, solution, messages)
        solution = solution.localCheckpoint(eager=True)
        messages = messages.localCheckpoint(eager=True)
    return solution
