"""Shared helpers for the declared query set.

Oracle-exact aggregation: the verification driver hash-compares Spark vs
DuckDB with floats rounded to 4 decimals. A double SUM over 10^5+ rows can
differ between engines by more than 1e-4 (different accumulation order), so
every large SUM here is computed in DECIMAL — exact and identical in both
engines — and cast back to DOUBLE at the end. Source money columns have 2
decimal digits, so a (18,2)-scale cast is lossless. AVG is derived from the
exact decimal sum divided by the count, written with the same expression
shape on both sides so the double division is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for any testdata magnitude; scale 4 covers 2-decimal money
# columns and 4-decimal rates losslessly.
#
# Why DECIMAL and not a ×10000 scaled-BIGINT sum (which benches ~1.6×
# faster locally): at 100 TB lineitem is ~6e11 rows; a scaled-long sum
# reaches ~6e20 and silently wraps past the int64 max (9.2e18) with ANSI
# off, while Spark's decimal sum auto-widens the result type
# (decimal(18,4) → decimal(28,4), max 1e24) and stays exact. The decimal
# overhead is the price of overflow-correctness at scale.
DEC = "decimal(18,4)"


def dsum(col: str | Column) -> Column:
    """Exact decimal sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB rendering of :func:`dsum` (identical math)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def davg(col: str | Column) -> Column:
    """Exact-sum-based average: CAST(decimal_sum AS DOUBLE) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def davg_sql(expr: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr})"
    )
