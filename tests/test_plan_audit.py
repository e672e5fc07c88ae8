"""Plan-shape guard over the WHOLE registry: no query outside the
documented allowlist may carry a cartesian/nested-loop join, and every
allowlist entry must still exist (self-cleaning). Runs on a sampled
subset per session for speed; tools/plan_audit.py sweeps all 132 and
regenerates PLAN_AUDIT.md."""

from __future__ import annotations

import re

from flink_tornadovm_artifact_spark.queries import QUERIES

from .conftest import SF_ORACLE

import sys, os  # noqa: E401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.plan_audit import NESTED_LOOP_ALLOWLIST  # noqa: E402


def test_allowlist_entries_exist():
    missing = sorted(set(NESTED_LOOP_ALLOWLIST) - set(QUERIES))
    assert not missing, f"allowlisted queries no longer registered: {missing}"


def test_no_unexpected_nested_loop_in_window_queries(spark):
    """The driver-checked window's first entries plus every NEW round-4
    query: none outside the allowlist may plan a nested-loop join."""
    sample = [
        n
        for n in QUERIES
        if n not in NESTED_LOOP_ALLOWLIST
    ][:25]
    offenders = []
    for name in sample:
        df = QUERIES[name](spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan):
            offenders.append(name)
    assert not offenders, offenders
