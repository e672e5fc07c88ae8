"""Sources and sinks mirroring the reference's ExecutionEnvironment /
DataSet I/O surface (SURVEY.md §2.A).

| reference (citation)                              | here                    |
|---------------------------------------------------|-------------------------|
| readTextFile (ExecutionEnvironment.java:449)      | read_text_file          |
| readCsvFile + includeFields mask (:556;           | read_csv_file           |
|   TPCHQuery3.java:286-303)                        |                         |
| readFileOfPrimitives (:524)                       | read_file_of_primitives |
| fromCollection / fromElements (:658,:709)         | from_collection/_elements |
| generateSequence                                  | generate_sequence       |
| writeAsText / writeAsFormattedText (DataSet.java  | write_as_text /         |
|   :1527,:1561) / writeAsCsv (:1599)               |  _formatted_text / _csv |

Parquet/ORC/JSON/Avro and the connector surface (Kafka, JDBC, Hive —
FT/flink-connectors, FT/flink-formats) are native ``spark.read.format``/
``spark.readStream.format`` calls; no wrapper adds value there. The JDBC
path is FUNCTIONAL in-container (sources/jdbc.py: embedded Derby ships
with PySpark's jars — JdbcInput/OutputFormat analogs with partitioned
reads, round-trip tested in tests/test_jdbc.py). Kafka and Avro need
their packages on the classpath — in this image they are not present, so
those raise at `.load()` time with Spark's own error naming the missing
source (pinned in test_missing_connector_packages_fail_clearly).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_text_file(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited text scan → one `value` string column."""
    return spark.read.text(path)


def read_csv_file(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    include_fields: str | None = None,
    field_delimiter: str = ",",
    ignore_first_line: bool = False,
) -> DataFrame:
    """CSV scan with the reference's projection mask semantics:
    ``include_fields`` is the '0110...' bitmask of readCsvFile
    (TPCHQuery3.java:286-303) — the schema describes the FULL file; masked
    columns are projected out (and pruned from the scan by Catalyst)."""
    df = (
        spark.read.schema(schema)
        .option("sep", field_delimiter)
        .option("header", str(ignore_first_line).lower())
        .csv(path)
    )
    if include_fields is not None:
        keep = [
            c for c, bit in zip(df.columns, include_fields) if bit == "1"
        ]
        df = df.select(*keep)
    return df


def read_file_of_primitives(
    spark: SparkSession, path: str, dtype: str = "long"
) -> DataFrame:
    """One primitive per line (ExecutionEnvironment.java:524)."""
    return spark.read.schema(f"value {dtype}").csv(path)


def from_collection(
    spark: SparkSession, data: Iterable, schema: T.StructType | str
) -> DataFrame:
    """Driver-local data → DataFrame (fromCollection, used by every
    reference tornadovm test, e.g. TestVectorAddition.java:52)."""
    return spark.createDataFrame(list(data), schema)


def from_elements(spark: SparkSession, *elements, schema: T.StructType | str) -> DataFrame:
    return from_collection(spark, elements, schema)


def generate_sequence(
    spark: SparkSession, start: int, end: int, partitions: int | None = None
) -> DataFrame:
    """Numeric range source [start, end] (generateSequence) — backed by
    spark.range, which parallelizes without materializing."""
    if partitions:
        return spark.range(start, end + 1, 1, partitions)
    return spark.range(start, end + 1)


def write_as_text(df: DataFrame, path: str, mode: str = "error") -> None:
    """Text sink (DataSet.writeAsText:1527): one line per row,
    comma-joined fields."""
    out = df.select(F.concat_ws(",", *df.columns).alias("value"))
    out.write.mode(mode).text(path)


def write_as_formatted_text(
    df: DataFrame, path: str, fmt: str, mode: str = "error"
) -> None:
    """Formatter-UDF text sink (DataSet.writeAsFormattedText:1561):
    ``fmt`` is a format_string pattern applied over the columns."""
    out = df.select(F.format_string(fmt, *df.columns).alias("value"))
    out.write.mode(mode).text(path)


def write_as_csv(
    df: DataFrame,
    path: str,
    mode: str = "error",
    field_delimiter: str = ",",
) -> None:
    """CSV sink with overwrite modes (DataSet.writeAsCsv:1599; overwrite
    enum WriteMode — Spark's mode= covers it)."""
    df.write.mode(mode).option("sep", field_delimiter).csv(path)
