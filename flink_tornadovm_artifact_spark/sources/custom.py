"""Custom input-format extension point (SURVEY.md §2.A "readFile /
createInput").

The reference lets users plug arbitrary ``InputFormat`` implementations
into the environment (``ExecutionEnvironment.java:562`` ``readFile``,
``:599`` ``createInput``), with the format declaring its own splits. The
Spark-4 analog is the Python DataSource API: a ``DataSource`` subclass
declares schema + reader, the reader plans ``InputPartition`` splits
(the InputFormat's ``createInputSplits``), and each partition is read
independently on executors — so a custom source scales out exactly like
a built-in one.

``SequenceDataSource`` is the worked example: the reference's
``generateSequence`` surface re-expressed as a partitioned custom
source, plus a derived Weyl low-discrepancy value per element (the same
sequence the pi kernel uses), proving per-partition deterministic
compute inside a custom reader.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_PHI = (math.sqrt(5.0) - 1.0) / 2.0  # Weyl increment


class _RangeSplit(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SequenceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = int(options.get("start", 0))
        self.end = int(options.get("end", 1000))  # exclusive
        self.num_partitions = int(options.get("numpartitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        """Split planning = InputFormat.createInputSplits: contiguous
        ranges, one per partition, so executors read independently."""
        n = max(1, self.num_partitions)
        total = max(0, self.end - self.start)
        step = -(-total // n) or 1
        return [
            _RangeSplit(s, min(s + step, self.end))
            for s in range(self.start, self.end, step)
        ] or [_RangeSplit(self.start, self.start)]

    def read(self, partition: _RangeSplit) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            x = i * _PHI
            yield (i, x - math.floor(x))


class SequenceDataSource(DataSource):
    """``spark.read.format("flink_sequence")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "flink_sequence"

    def schema(self) -> str:
        return "id bigint, weyl double"

    def reader(self, schema) -> _SequenceReader:
        return _SequenceReader({k.lower(): v for k, v in self.options.items()})


def register_sequence_source(spark: SparkSession) -> None:
    spark.dataSource.register(SequenceDataSource)


def read_sequence(
    spark: SparkSession, start: int, end: int, num_partitions: int = 4
) -> DataFrame:
    """createInput(customFormat) one-liner over the registered source."""
    register_sequence_source(spark)
    return (
        spark.read.format("flink_sequence")
        .option("start", start)
        .option("end", end)
        .option("numPartitions", num_partitions)
        .load()
    )
