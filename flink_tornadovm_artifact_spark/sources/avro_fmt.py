"""Avro format support, gated on the spark-avro module's presence
(SURVEY.md §2.A formats row; reference ``FT/flink-formats/flink-avro/``).

Spark treats Avro as a built-in-but-external data source: the core
``avro-*.jar``s ship with PySpark, but the ``spark-avro`` DataSource
module is a separate artifact that this container does not carry. These
helpers make the gate explicit and typed instead of letting the raw
``Failed to find data source: avro`` surface mid-pipeline:

- ``avro_available(spark)`` probes the session's classpath once;
- ``write_avro`` / ``read_avro`` delegate to the native format when
  present and raise ``AvroUnavailableError`` (with the exact deploy
  remedy) when not.

With the module deployed (``--packages org.apache.spark:spark-avro_2.13:<ver>``)
the same calls are a full fidelity round trip — the gated test in
tests/test_avro.py pins whichever branch is live in the environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PROBE: dict[int, bool] = {}


class AvroUnavailableError(RuntimeError):
    def __init__(self) -> None:
        super().__init__(
            "the spark-avro data source module is not on this session's "
            "classpath; deploy org.apache.spark:spark-avro_2.13 (matching "
            "the Spark version) via spark.jars.packages to enable "
            "read/write of Avro files"
        )


def avro_available(spark: SparkSession) -> bool:
    """True when the avro DataSource resolves on this session."""
    key = id(spark)
    if key not in _PROBE:
        try:
            spark._jvm.org.apache.spark.sql.avro.AvroFileFormat  # noqa: B018
            # class presence is necessary; resolution through the
            # registry is what read/write actually exercises
            spark.read.format("avro").schema("x int").load(
                "/nonexistent-avro-probe"
            ).schema
            _PROBE[key] = True
        except Exception as e:  # noqa: BLE001
            # path-not-found means the FORMAT resolved fine
            _PROBE[key] = "Failed to find data source" not in str(e)
    return _PROBE[key]


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not avro_available(df.sparkSession):
        raise AvroUnavailableError()
    df.write.format("avro").mode(mode).save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise AvroUnavailableError()
    return spark.read.format("avro").load(path)
