"""Kafka-shaped file-backed source/sink (SURVEY.md §2.A connectors row).

The container ships neither a Kafka broker nor the ``spark-sql-kafka``
package, so the real ``spark.readStream.format("kafka")`` path cannot
run here (the degradation is pinned in tests/test_sources_plans.py).
This module closes the semantic gap with a file-backed stand-in that
exposes **Kafka's exact reader contract** — mirroring what
``FT/flink-connectors/flink-connector-kafka/``'s FlinkKafkaConsumer
guarantees (partitioned ordered logs, offset-addressed replay,
exactly-once with checkpointed offsets) — so a pipeline written against
it ports to the real connector by swapping the reader call only:

- **Schema**: every read returns Kafka's seven columns — ``key binary,
  value binary, topic string, partition int, offset long, timestamp
  timestamp, timestampType int`` — byte-identical to
  ``spark.read.format("kafka")``.
- **Log layout**: ``<broker_dir>/topic=<t>/partition=<p>/*.parquet``,
  hive-partitioned so topic subscription and partition selection become
  directory pruning (the Spark-native analog of Kafka's
  topic-partition assignment; ``.explain`` shows the pruned scan).
- **Offsets**: per-(topic, partition) dense, monotone, assigned at
  produce time — the broker's log-append order. ``startingOffsets`` /
  ``endingOffsets`` accept ``"earliest"``, ``"latest"``, or the
  connector's JSON form ``{"topic": {"0": 5}}`` (start inclusive, end
  exclusive, Kafka's convention).
- **Exactly-once**: segments are immutable once produced and offsets
  are stored IN the data, so any offset range re-reads to the
  bit-identical result (replayability), and a Structured Streaming
  query over the log with a checkpoint resumes after failure without
  loss or duplication — the same two properties FlinkKafkaConsumer
  derives from offsets in checkpoints.

Scale notes (100 TB discipline): a produce appends one parquet segment
per (topic, partition) — no read-modify-write, so producers scale to
arbitrary log size; offset assignment reads only the previous segment
maximum per partition (a footer-statistics read, not a data scan).
Readers are ordinary partitioned parquet scans: topic/partition filters
prune directories, offset predicates push to row groups.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Kafka's fixed reader schema (spark-sql-kafka's KafkaRecordToRowConverter).
KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

#: Kafka TimestampType.CREATE_TIME — the producer-stamped kind.
CREATE_TIME = 0


def _partition_dir(broker_dir: str, topic: str, partition: int) -> str:
    return os.path.join(broker_dir, f"topic={topic}", f"partition={partition}")


def _next_offset(pdir: str) -> int:
    """Next dense offset for a partition = 1 + max over existing
    segments, read from parquet footer statistics (no data scan)."""
    if not os.path.isdir(pdir):
        return 0
    import pyarrow.parquet as pq

    nxt = 0
    for seg in os.listdir(pdir):
        if not seg.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(pdir, seg)).metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # offset column, see produce()
            stats = col.statistics
            if stats is not None and stats.has_min_max:
                nxt = max(nxt, int(stats.max) + 1)
    return nxt


def produce(
    broker_dir: str,
    topic: str,
    records: list[tuple[bytes | None, bytes]],
    num_partitions: int = 2,
    partition_of=None,
) -> dict[int, tuple[int, int]]:
    """Append records to the log — the FlinkKafkaProducer analog.

    ``records`` are (key, value) byte pairs; routing follows Kafka's
    default partitioner (hash of key, round-robin batch for keyless),
    overridable via ``partition_of(key) -> int``. Appends ONE immutable
    segment per touched partition with dense offsets continuing the
    partition's log. Returns {partition: (first_offset, next_offset)}.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    if partition_of is None:

        def partition_of(key: bytes | None) -> int:
            if key is None:
                return int(uuid.uuid4().int) % num_partitions
            # deterministic, seed-independent analog of murmur2(key)
            h = 2166136261
            for b in key:
                h = ((h ^ b) * 16777619) & 0xFFFFFFFF
            return h % num_partitions

    by_part: dict[int, list[tuple[bytes | None, bytes]]] = {}
    for key, value in records:
        by_part.setdefault(partition_of(key), []).append((key, value))

    now_us = time.time_ns() // 1_000
    out: dict[int, tuple[int, int]] = {}
    for part, recs in sorted(by_part.items()):
        pdir = _partition_dir(broker_dir, topic, part)
        os.makedirs(pdir, exist_ok=True)
        first = _next_offset(pdir)
        offsets = list(range(first, first + len(recs)))
        # column order matters: _next_offset reads column(0) statistics
        table = pa.table(
            {
                "offset": pa.array(offsets, pa.int64()),
                "key": pa.array([k for k, _ in recs], pa.binary()),
                "value": pa.array([v for _, v in recs], pa.binary()),
                "timestamp": pa.array([now_us] * len(recs), pa.timestamp("us")),
                "timestampType": pa.array([CREATE_TIME] * len(recs), pa.int32()),
            }
        )
        pq.write_table(table, os.path.join(pdir, f"seg-{uuid.uuid4().hex}.parquet"))
        out[part] = (first, first + len(recs))
    return out


def current_offsets(broker_dir: str, topic: str) -> dict[int, int]:
    """{partition: next_offset} — the log-end offsets ("latest")."""
    tdir = os.path.join(broker_dir, f"topic={topic}")
    if not os.path.isdir(tdir):
        return {}
    parts = {}
    for d in os.listdir(tdir):
        if d.startswith("partition="):
            p = int(d.split("=", 1)[1])
            parts[p] = _next_offset(os.path.join(tdir, d))
    return parts


def _offset_bounds(spec, topic: str, broker_dir: str, default: int):
    """Resolve an offsets spec to {partition: offset}. ``default`` is
    used for partitions the JSON form omits (-2 = earliest→0,
    -1 = latest→log end), matching the connector's JSON semantics."""
    log_end = current_offsets(broker_dir, topic)
    if spec == "earliest":
        return dict.fromkeys(log_end, 0)
    if spec == "latest":
        return dict(log_end)
    by_part = json.loads(spec).get(topic, {}) if isinstance(spec, str) else spec
    out = {}
    for p, end in log_end.items():
        o = int(by_part.get(str(p), by_part.get(p, default)))
        out[p] = end if o == -1 else 0 if o == -2 else o
    return out


def read_batch(
    spark: SparkSession,
    broker_dir: str,
    subscribe: str,
    starting_offsets: str | dict = "earliest",
    ending_offsets: str | dict = "latest",
    starting_offsets_by_timestamp: str | dict | None = None,
) -> DataFrame:
    """Bounded read — the ``spark.read.format("kafka")`` analog.
    ``starting_offsets_by_timestamp`` (JSON or dict
    {topic: {partition: epoch_ms}}) takes precedence over
    ``starting_offsets``, matching the connector's option precedence.

    Offsets are [start, end) per partition, Kafka's convention. The
    topic/partition/offset predicates are ordinary column filters on a
    hive-partitioned scan, so topic and partition prune directories and
    the offset range pushes to parquet row groups.
    """
    ts_spec = (
        json.loads(starting_offsets_by_timestamp)
        if isinstance(starting_offsets_by_timestamp, str)
        else starting_offsets_by_timestamp
    )
    frames = []
    for topic in subscribe.split(","):
        topic = topic.strip()
        if ts_spec is not None:
            start = offsets_for_times(
                broker_dir, topic, ts_spec.get(topic, {})
            )
        else:
            start = _offset_bounds(starting_offsets, topic, broker_dir, -2)
        end = _offset_bounds(ending_offsets, topic, broker_dir, -1)
        tdir = os.path.join(broker_dir, f"topic={topic}")
        if not os.path.isdir(tdir) or not start:
            continue
        df = spark.read.option("basePath", broker_dir).parquet(tdir)
        cond = F.lit(False)
        for p in start:
            cond = cond | (
                (F.col("partition") == p)
                & (F.col("offset") >= start[p])
                & (F.col("offset") < end.get(p, start[p]))
            )
        frames.append(df.filter(cond))
    if not frames:
        raise ValueError(f"no data for subscription {subscribe!r}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "key", "value", "topic",
        F.col("partition").cast("int").alias("partition"),
        "offset",
        # parquet µs timestamps surface as TIMESTAMP_NTZ; Kafka's
        # reader column is TimestampType
        F.col("timestamp").cast("timestamp").alias("timestamp"),
        "timestampType",
    )


def read_stream(
    spark: SparkSession,
    broker_dir: str,
    subscribe: str,
    starting_offsets: str | dict = "earliest",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read — the ``spark.readStream.format("kafka")`` analog.

    Built on the file-stream source, whose checkpoint tracks processed
    segments exactly as the Kafka source checkpoints offsets: a query
    restarted on the same checkpoint resumes where it stopped,
    processing each record exactly once (with a deterministic sink
    transactionally committing batch ids — Spark's standard end-to-end
    exactly-once recipe). ``startingOffsets`` filters below the stream,
    so "latest"-style subscriptions skip the existing log.

    Only single-topic subscriptions stream (one directory tree per
    query) — the same one-consumer-per-topic shape FlinkKafkaConsumer
    instances take.
    """
    topic = subscribe.strip()
    if "," in topic:
        raise ValueError("streaming subscription takes a single topic")
    start = _offset_bounds(starting_offsets, topic, broker_dir, -2)
    tdir = os.path.join(broker_dir, f"topic={topic}")
    # the declared types must match the parquet physical types (µs NTZ);
    # the partition column materializes from the directory name —
    # discovery roots at the TOPIC directory, so `partition=` is the
    # only partition column (declaring `topic` too would need basePath
    # at the broker root, which trips the reader's partition-count
    # assertion on the single-topic subset)
    reader = spark.readStream.schema(
        "offset long, key binary, value binary, "
        "timestamp timestamp_ntz, timestampType int, partition int"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(tdir)
    cond = F.lit(False)
    for p, o in start.items():
        cond = cond | ((F.col("partition") == p) & (F.col("offset") >= o))
    if not start:  # empty log yet: pass everything through
        cond = F.lit(True)
    return df.filter(cond).select(
        "key", "value",
        F.lit(topic).alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        "offset",
        F.col("timestamp").cast("timestamp").alias("timestamp"),
        "timestampType",
    )


def offsets_for_times(
    broker_dir: str, topic: str, ts_ms_by_partition: dict
) -> dict[int, int]:
    """``startingOffsetsByTimestamp`` resolution — the
    ``KafkaConsumer.offsetsForTimes`` contract the real connector
    delegates to the broker: per partition, the EARLIEST offset whose
    record timestamp is >= the requested epoch-millis; partitions with
    no such record start at log end (Kafka returns null → the source
    falls back to latest). Partitions absent from the spec start at
    earliest. Reads only the (offset, timestamp) columns of the
    partition's segments via parquet column pruning — the stand-in's
    equivalent of the broker's time index."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pds

    out = {}
    for p, end in current_offsets(broker_dir, topic).items():
        ts_ms = ts_ms_by_partition.get(p, ts_ms_by_partition.get(str(p)))
        if ts_ms is None:
            out[p] = 0
            continue
        dataset = pds.dataset(
            _partition_dir(broker_dir, topic, p), format="parquet"
        )
        tbl = dataset.to_table(
            columns=["offset"],
            filter=pds.field("timestamp")
            >= pc.scalar(int(ts_ms) * 1000).cast("timestamp[us]"),
        )
        # aggregate, don't materialize: a timestamp near the log start
        # would otherwise pull the whole offset column driver-side
        out[p] = pc.min(tbl.column("offset")).as_py() if tbl.num_rows else end
    return out
