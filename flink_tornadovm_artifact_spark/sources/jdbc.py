"""Functional JDBC source/sink (SURVEY.md §2.A connectors row).

Mirrors ``FT/flink-connectors/flink-connector-jdbc/`` —
``JdbcInputFormat`` (parallel reads via a parameterized split query) and
``JdbcOutputFormat`` (batched writes) — on Spark's native
``spark.read.jdbc`` / ``DataFrameWriter.jdbc``.

The container ships no external database and no SQLite/Postgres/MySQL
driver jars, but PySpark's own classpath includes **Apache Derby**
(``derby*.jar``, bundled for the Hive metastore), a complete embedded
SQL database with a JDBC driver — so the JDBC path here is a real
end-to-end round trip through a real SQL engine, not a mock. Against a
production database only the URL/driver change:

    jdbc_read(spark, "jdbc:postgresql://host/db", "t",
              driver="org.postgresql.Driver", ...)

Scale notes (100 TB discipline):
- ``jdbc_read`` exposes Spark's partitioned-read contract
  (partition_column/lower/upper/num_partitions → one WHERE-range query
  per partition, executed concurrently) — the exact analog of
  JdbcInputFormat's ``JdbcParameterValuesProvider`` splits. An
  unpartitioned JDBC read is a single-task scan; always partition reads
  of large tables.
- predicate/column pruning push into the remote query (Spark compiles
  ``filter``/``select`` on a JDBC relation into the generated SQL), so
  the database ships only the needed rows/columns.
- ``jdbc_write`` uses the driver's ``batchsize`` batched inserts, the
  JdbcOutputFormat execution model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

#: Embedded Derby URL for an on-disk database directory (created on
#: first use). Derby runs inside the Spark JVM — fine in local mode and
#: for metastore-sized side tables; a multi-executor cluster needs a
#: network-reachable database instead.
def derby_url(db_dir: str) -> str:
    return f"jdbc:derby:{db_dir};create=true"


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 1000,
    driver: str | None = None,
) -> None:
    """JdbcOutputFormat analog: batched inserts into ``table``."""
    w = df.write.format("jdbc").option("url", url).option(
        "dbtable", table
    ).option("batchsize", str(batchsize))
    if driver:
        w = w.option("driver", driver)
    w.mode(mode).save()


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    driver: str | None = None,
) -> DataFrame:
    """JdbcInputFormat analog. With the partition_* quartet set, Spark
    issues ``num_partitions`` concurrent range queries (the split
    contract of JdbcParameterValuesProvider); without it the read is one
    task — acceptable only for small dimension tables."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
