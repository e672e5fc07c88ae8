"""Physical-plan introspection: assert that Catalyst produced the plan you
wanted (pushdown reached the scan, the dim join went broadcast, the hot
path stays in whole-stage codegen).

This is the rebuild's analog of the reference's breakdown/profiling
tooling (FlinkTornadoVMLogger, EV/BreakdownEvaluation.java): where the
reference measures marshalling/kernel phases, a Spark engine's first
feedback loop is the physical plan itself.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Columns each scan actually reads (column-pruning check)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of EXPLICIT broadcast hints in the analyzed logical plan.

    An explicit ``F.broadcast(df)`` pins the strategy — AQE cannot demote
    it if the side turns out huge. Scale discipline: hints only on
    bounded dims (SMALL_DIMS), never on SF-linear tables; this counts
    them so tests can pin exactly which sides are hinted."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return plan.count("ResolvedHint")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen spans (wider is better for hot paths).
    AQE plans only materialize codegen stages once executed, so by default
    this runs the plan (against a noop sink) and inspects executedPlan."""
    if execute:
        # collect() drives THIS DataFrame's QueryExecution so its
        # AdaptiveSparkPlan finalizes (a write would spawn a fresh one);
        # intended for plan inspection in tests, not production paths
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages appear as "*(n) Operator" markers in plan strings
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
