"""Declared query registry.

Aggregates every query module's ``QUERIES`` (name → callable(spark, sf_dir)
→ DataFrame) and ``ORACLE`` (name → DuckDB SQL) into flat dicts consumed by
``__spark_entry__.py``. Queries without an oracle entry get the driver's
weaker rows-only check (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import iot, llm, ml, procedural, relational, tpch, windows

_MODULES = (relational, tpch, iot, ml, windows, llm, procedural)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        QUERIES[_name] = _fn
    ORACLE.update(_m.ORACLE)

_missing = set(ORACLE) - set(QUERIES)
if _missing:
    raise ValueError(f"oracle entries without queries: {sorted(_missing)}")
