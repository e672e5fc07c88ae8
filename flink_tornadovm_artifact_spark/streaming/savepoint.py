"""Offline inspection of streaming state — the Spark analog of the
reference's state-processor API (``FT/flink-libraries/
flink-state-processing-api/.../Savepoint.java``: ``Savepoint.load(...)``
then ``ExistingSavepoint.readKeyedState``).

Structured Streaming checkpoints persist every stateful operator's keyed
state store; Spark's built-in ``statestore`` data source reads one
offline — no running query needed — exactly the reference's
read-a-savepoint-as-a-DataSet workflow. Each call is a normal batch scan,
so the result joins/filters/aggregates like any DataFrame.

Reading covers the ExistingSavepoint surface. WritableSavepoint
(bootstrapping NEW state) cannot write Spark's internal checkpoint
files, but the capability itself is covered by the bootstrap section
below: persist keyed state as a plain table and seed the stream with
tagged init rows (the KeyedStateBootstrapFunction contract).

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


# ---------------------------------------------------------------------------
# WritableSavepoint analog (round 4): state BOOTSTRAP.
#
# The reference's flink-state-processing-api also WRITES savepoints
# (Savepoint.create().withOperator(uid, transformation).write(path)):
# batch-build keyed state offline, then start a streaming job FROM it.
# Spark cannot write a checkpoint's internal state files, but the same
# capability is expressible natively: persist the keyed state as an
# ordinary table (write_keyed_state), then feed it into the stream as
# one-time tagged init rows that the stateful function applies before
# any live event for the key (bootstrap_union). The state function
# initializes from init rows exactly as Flink's
# KeyedStateBootstrapFunction does — and because the bootstrap table
# shuffles on the same key as the stream, initialization is co-located
# with the state it seeds, never driver-bound.
# ---------------------------------------------------------------------------
def write_keyed_state(state_df: DataFrame, path: str) -> None:
    """``Savepoint.create().write`` analog: persist a keyed-state table
    (one row per key) built by any batch computation."""
    state_df.write.mode("overwrite").parquet(path)


def bootstrap_union(
    spark: SparkSession,
    events: DataFrame,
    bootstrap_path: str,
    schema: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Union the bootstrap table into the live stream as init rows.

    The bootstrap parquet directory is read as a file stream (static
    contents → delivered once, in the first micro-batch) with
    ``__init = true``; live rows carry ``__init = false``. ``schema``
    is the bootstrap table's schema; columns absent from either side
    are null-filled. Init rows get the MINIMUM timestamp so any
    event-time ordering inside the stateful function applies them
    first — the KeyedStateBootstrapFunction contract.
    """
    boot = (
        spark.readStream.schema(schema)
        .parquet(bootstrap_path)
        .withColumn("__init", F.lit(True))
        .withColumn(ts_col, F.lit("1970-01-01 00:00:00").cast("timestamp"))
    )
    live = events.withColumn("__init", F.lit(False))
    all_cols = list(dict.fromkeys(live.columns + boot.columns))
    fill = lambda df: df.select(
        *[
            (F.col(c) if c in df.columns else F.lit(None)).alias(c)
            for c in all_cols
        ]
    )
    return fill(live).unionByName(fill(boot))


class StateStoreQueryableState:
    """``asQueryableState`` served from the engine's OWN state store —
    the closest Spark gets to the reference's QueryableStateClient
    (``KeyedStream.java:1015`` + queryable-state server): point lookups
    read the running query's checkpointed store via the ``statestore``
    data source, so there is no side sink, no driver-held map, and no
    second copy of the state (the approximations the foreachBatch-based
    ``QueryableState``/``ExternalQueryableState`` analogs make).

    Staleness is the last COMMITTED micro-batch — the same
    read-committed visibility Flink's server gives (it answers from the
    last completed checkpoint's registered state). Reads are plain
    batch scans of the store files and are safe concurrent with the
    running writer; a full-state ``snapshot()`` stays partitioned like
    the streaming shuffle and never collects to the driver.
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint: str,
        operator_id: int = 0,
        store_name: str | None = None,
    ):
        self._spark = spark
        self._checkpoint = checkpoint
        self._operator_id = operator_id
        self._store_name = store_name

    def snapshot(self, batch_id: int | None = None) -> DataFrame:
        """The full keyed state as of the latest committed batch (or a
        time-travel ``batch_id``), flattened to key_*/value_* columns."""
        return read_keyed_state(
            self._spark,
            self._checkpoint,
            batch_id=batch_id,
            operator_id=self._operator_id,
            store_name=self._store_name,
        )

    def get(self, **key):
        """Point lookup by the operator's FULL key: ``get(user_id=7)``
        → the key's value row as a dict, or None if the key has no
        state. Every key_* column of the store schema must be supplied
        up front — a multiplicity check alone would let a partial key
        that happens to match one row silently read an arbitrary key's
        state once the keyspace shrinks."""
        df = self.snapshot()
        key_cols = [c[len("key_"):] for c in df.columns if c.startswith("key_")]
        missing = sorted(set(key_cols) - set(key))
        unknown = sorted(set(key) - set(key_cols))
        if missing or unknown:
            raise ValueError(
                f"state key columns are {sorted(key_cols)}; "
                f"missing={missing}, unknown={unknown}"
            )
        for col, val in key.items():
            df = df.filter(F.col(f"key_{col}") == val)
        rows = df.limit(2).collect()
        if not rows:
            return None
        if len(rows) > 1:
            raise ValueError(
                f"key {key} matched {len(rows)}+ state rows — the store "
                "holds duplicate rows for a full key (corrupt snapshot?)"
            )
        d = rows[0].asDict()
        return {
            k[len("value_"):]: v for k, v in d.items() if k.startswith("value_")
        }
