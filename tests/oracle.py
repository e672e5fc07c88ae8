"""Local mirror of the verification driver's DuckDB differential oracle.

Canonicalization: sort columns by name, round float/double to 4 decimals,
sort rows, compare. This is the same contract as CORRECTNESS_r{N}.json
(FIXTURES.md: "exact for int/long; round(…,4)-then-hash for float/double").
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    if isinstance(v, Decimal):
        return round(float(v), 4)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


#: Coarse type families: the driver's value-hash is type-sensitive (it
#: hashes Arrow buffers), so a DuckDB DECIMAL(38,0) vs Spark BIGINT is a
#: hash FAIL even when the values round-trip equal (CORRECTNESS_r01 q36).
#: We therefore require both sides to land in the same family.
def _type_family(t: str) -> str:
    t = t.lower()
    if "decimal" in t:
        return "decimal"
    # ints are width-exact: the driver hashes Arrow buffers, so Spark
    # int32 vs DuckDB int64 is a driver hash FAIL even though the
    # values compare equal (caught on text_chunk_windows.start_tok /
    # text_tfidf_keywords.rk in round 6 before the driver saw them)
    if "bigint" in t or "int64" in t or t == "long":
        return "int64"
    if "smallint" in t or "int16" in t or t == "short":
        return "int16"
    if "tinyint" in t or "int8" in t or "byte" in t:
        return "int8"
    if any(k in t for k in ("int", "integer")):
        return "int32"
    if any(k in t for k in ("float", "double", "halffloat")):
        return "float"
    if "bool" in t:
        return "bool"
    if any(k in t for k in ("string", "utf8", "varchar", "char")):
        return "string"
    if "timestamp" in t:
        return "timestamp"
    if "date" in t:
        return "date"
    if any(k in t for k in ("list", "array")):
        return "list"
    if "binary" in t:
        return "binary"
    return t


def types_compatible(spark_df, d_schema) -> tuple[bool, str]:
    """Compare Spark dtypes vs DuckDB Arrow schema at the family level."""
    s_types = dict(spark_df.dtypes)
    bad = []
    for field in d_schema:
        if field.name not in s_types:
            continue
        sf, df_ = _type_family(s_types[field.name]), _type_family(str(field.type))
        if sf != df_:
            bad.append(f"{field.name}: spark={s_types[field.name]} duckdb={field.type}")
    if bad:
        return False, "type-family mismatch (driver hash would fail): " + "; ".join(bad)
    return True, "ok"


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    """Round 13: ONE DuckDB execution serves both the type-family check
    and the row comparison — the r1-r12 shape executed every oracle
    twice (fetch_arrow_table for the schema, fetchall for rows), which
    doubled the DuckDB share of the 247-oracle x 2-SF pytest sweep.
    Arrow-vs-fetchall value equivalence was verified over every oracle
    at both SFs before the switch (round-13 work log)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    tbl = con.execute(sql).fetch_arrow_table()
    d_cols = list(tbl.column_names)
    d_rows = [tuple(d[c] for c in d_cols) for d in tbl.to_pylist()]
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    ok_t, msg_t = types_compatible(spark_df, tbl.schema)
    if not ok_t:
        return False, msg_t
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = canonicalize(s_cols, s_rows), canonicalize(d_cols, d_rows)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
