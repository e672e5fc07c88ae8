"""Offline inspection of streaming state — the Spark analog of the
reference's state-processor API (``FT/flink-libraries/
flink-state-processing-api/.../Savepoint.java``: ``Savepoint.load(...)``
then ``ExistingSavepoint.readKeyedState``).

Structured Streaming checkpoints persist every stateful operator's keyed
state store; Spark's built-in ``statestore`` data source reads one
offline — no running query needed — exactly the reference's
read-a-savepoint-as-a-DataSet workflow. Each call is a normal batch scan,
so the result joins/filters/aggregates like any DataFrame.

Reading covers the ExistingSavepoint surface; WritableSavepoint
(bootstrapping NEW state into a checkpoint) has no Spark equivalent and
is documented out of scope — a migration would instead replay a batch
source through the streaming query to rebuild state.

At scale: the state store is partitioned exactly like the streaming
shuffle (one store per shuffle partition), and the reader exposes
``partition_id`` — a full-state scan is embarrassingly parallel and
never collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_keyed_state(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Read a streaming query's keyed state from its checkpoint
    directory (``ExistingSavepoint.readKeyedState`` analog).

    ``batch_id`` time-travels to the state as of that micro-batch (the
    reference's savepoint-version selection); default is the latest
    committed batch. ``operator_id``/``store_name`` address one store
    when the query has several stateful operators (stream-stream joins
    keep four stores, selected by name). With ``flatten`` the nested
    key/value structs are splayed into top-level columns.
    """
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if operator_id:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    cols = [F.col(f"key.{c}").alias(f"key_{c}") for c in df.schema["key"].dataType.names]
    cols += [
        F.col(f"value.{c}").alias(f"value_{c}")
        for c in df.schema["value"].dataType.names
    ]
    return df.select(*cols, "partition_id")
