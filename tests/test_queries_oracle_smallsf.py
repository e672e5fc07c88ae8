"""Differential-oracle sweep at the SMALLEST scale factor.

SF-dependence is its own bug class: round 6 caught dft_events' oracle
hardcoding the signal length cap (N=2048) while the Spark kernel adapts
to the actual rows — green at sf0.01, wrong at sf0.001 where the events
table is shorter than the cap. Running every oracle at sf0.001 pins
that queries don't bake in assumptions about the corpus being "big
enough" (empty groups, short signals, sparse graphs).
"""

from __future__ import annotations

import pytest

from flink_tornadovm_artifact_spark.queries import ORACLE, QUERIES

from .conftest import SF_SMOKE
from .oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle_at_smallest_sf(name, spark, con):
    df = QUERIES[name](spark, SF_SMOKE)
    ok, msg = compare(df, con, ORACLE[name])
    assert ok, f"{name}@sf0.001: {msg}"
