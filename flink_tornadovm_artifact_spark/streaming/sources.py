"""Streaming sources/sinks (SURVEY.md §2.A streaming rows).

The reference's DataStream sources (socket, file-monitor, collection,
Kafka — StreamExecutionEnvironment) map to ``spark.readStream.format(...)``;
this module provides the file-monitor source over the testdata events
schema plus a synchronous memory-sink runner for tests (a batch of files
drives the streaming query to completion deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: Historical name: the nanos-era schema (``ts`` as raw int64). Kept for
#: callers that write their own int64-ts fixture files.
EVENTS_SCHEMA = _events_schema(T.LongType())


def events_file_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-monitor source over a directory of events parquet files.
    ``max_files_per_trigger`` bounds each micro-batch (Flink's
    file-monitor splits analog) — required to observe watermark
    progression across batches in tests.

    The testdata generator has shipped ``ts`` both as parquet
    TIMESTAMP(NANOS) (readable only as raw int64 via ``nanosAsLong``)
    and as TIMESTAMP(MICROS) (native TimestampType). readStream needs
    the schema up front, so probe the directory with a batch read —
    the same dtype guard tables.load applies — and branch: int64 nanos
    ride as long and are truncated to micros; native timestamps pass
    through. An EMPTY monitoring directory (the file-monitor use case:
    start watching before any producer writes) cannot be probed; it
    defaults to the native-timestamp schema the current generator
    emits.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ts_is_long = (
            dict(spark.read.parquet(directory).dtypes).get("ts") == "bigint"
        )
    except Exception:  # empty or not-yet-existing directory
        ts_is_long = False
    reader = spark.readStream.schema(
        _events_schema(T.LongType() if ts_is_long else T.TimestampType())
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(directory)
    if ts_is_long:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Built-in rate source (smoke-testing unbounded pipelines)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def with_ingestion_time(df: DataFrame, col: str = "ingest_ts") -> DataFrame:
    """Ingestion-time characteristic (StreamExecutionEnvironment
    setStreamTimeCharacteristic(IngestionTime)): Structured Streaming is
    event-time-only, so ingestion time is stamped at the source with the
    micro-batch's processing clock — every row in a trigger shares its
    ingest timestamp, exactly Flink's source-assigned ingestion time at
    trigger granularity. The stamped column can then drive watermarks and
    windows like any event-time column."""
    return df.withColumn(col, F.current_timestamp())


def memory_sink_run(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming query to completion against currently-available
    input (processAllAvailable), return the materialized result. Test-only:
    the memory sink collects to the driver."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
