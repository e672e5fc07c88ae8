"""Vacuity guard: every oracle-backed query must be non-vacuous at sf0.01.

Round-2 (q19) and round-3 (q51) each shipped a query whose predicate
matched ZERO fixture rows, so Spark and DuckDB both returned empty
results and the driver's rows/schema/hash comparison passed on 0 == 0 —
a green row that never exercised the query's join/agg topology.

This guard kills that class permanently: for every query in ORACLE we run
the DuckDB side alone (cheap — no Spark) and assert it produces at least
one row. Combined with test_queries_oracle.py's differential (which
proves spark rows == oracle rows), oracle_rows > 0 implies
spark_rows > 0 for every green query.

Queries whose correct result IS legitimately empty must be listed in
EMPTY_OK with a justification; the allowlist is intentionally empty
today.
"""

from __future__ import annotations

import pytest

from flink_tornadovm_artifact_spark.queries import ORACLE

from .conftest import SF_ORACLE
from .oracle import duckdb_con

#: name -> reason the empty result is the CORRECT answer on the fixture.
EMPTY_OK: dict[str, str] = {}


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_is_not_vacuous(name, con):
    if name in EMPTY_OK:
        pytest.skip(f"legitimately empty: {EMPTY_OK[name]}")
    n = len(con.execute(ORACLE[name]).fetchall())
    assert n > 0, (
        f"{name}: oracle returns 0 rows at sf0.01 — the query passes the "
        f"differential vacuously (q19/q51 failure class). Widen the "
        f"predicate to match fixture data or add to EMPTY_OK with a "
        f"justification."
    )
