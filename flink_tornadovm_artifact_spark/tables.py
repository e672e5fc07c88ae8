"""Loaders for the driver-generated testdata tables.

Tables (one parquet file each, see TESTDATA.md): region nation customer
supplier part orders lineitem events documents embeddings.

Parquet scans get predicate pushdown + column pruning from Catalyst for
free; at 100 TB the same loaders work against a partitioned table directory
(spark.read.parquet on a directory of files) with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

#: Bounded dimension tables that are safe to broadcast-hint in joins.
#: Only tables whose row count does NOT grow with scale factor qualify:
#: region (5 rows) and nation (25 rows) are fixed-size in TPC-H; every
#: other table (customer SF*150k, supplier SF*10k, part SF*200k, ...) is
#: SF-linear and must stay unhinted so AQE decides at runtime — a pinned
#: broadcast hint cannot be demoted and OOMs at 100 TB.
SMALL_DIMS = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's reader rejects by default. We read it as raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
    TimestampType — the same truncation DuckDB applies, so oracle
    comparisons agree.

    The nanosAsLong conf is session-wide and deliberately left set:
    ``session.get_spark`` sets it at build time, and we re-set it here for
    *foreign* sessions (e.g. the driver harness builds its own
    SparkSession) because the conf is consulted lazily at scan execution
    time — a set/restore around this call would break the read when the
    action runs later.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: nanos exceed 2^53, a double round-trip
            # would lose sub-microsecond precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register temp views so spark.sql() queries can reference tables by name."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
