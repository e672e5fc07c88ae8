"""Kafka-shaped file-backed source: the connector-semantics tests the
reference keeps in flink-connector-kafka, ported to the stand-in —
offset-addressed replay, [start, end) slicing, dense per-partition
offsets, exactly-once across a query restart, and partition pruning in
the scan plan.
"""

from __future__ import annotations

import os

from flink_tornadovm_artifact_spark.sources.kafka_shaped import (
    KAFKA_SCHEMA,
    current_offsets,
    produce,
    read_batch,
    read_stream,
)


def _values(df):
    return sorted(bytes(r.value).decode() for r in df.collect())


def _by_partition(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.partition, []).append((r.offset, bytes(r.value).decode()))
    return {p: sorted(v) for p, v in out.items()}


def _keyed(i: int) -> tuple[bytes, bytes]:
    return (f"k{i}".encode(), f"v{i}".encode())


def test_produce_read_roundtrip_schema_and_offsets(spark, tmp_path):
    broker = str(tmp_path / "broker")
    produce(broker, "clicks", [_keyed(i) for i in range(20)], num_partitions=3)
    df = read_batch(spark, broker, "clicks")
    # the seven Kafka reader columns, in Kafka's order and types
    assert [f.name for f in df.schema.fields] == [
        s.split()[0] for s in KAFKA_SCHEMA.split(",")
    ]
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert got == {
        "key": "binary", "value": "binary", "topic": "string",
        "partition": "int", "offset": "bigint",
        "timestamp": "timestamp", "timestampType": "int",
    }
    assert _values(df) == sorted(f"v{i}" for i in range(20))
    # offsets are dense 0..n-1 per partition (the broker log contract)
    for p, rows in _by_partition(df).items():
        assert [o for o, _ in rows] == list(range(len(rows)))
    assert df.filter("topic <> 'clicks'").count() == 0


def test_offset_slice_and_replay(spark, tmp_path):
    """[start, end) JSON offsets — and re-reading any slice is
    bit-identical (immutable segments = Kafka's replayability)."""
    broker = str(tmp_path / "broker")
    # single partition so the slice is deterministic
    produce(broker, "t", [_keyed(i) for i in range(10)],
            num_partitions=1, partition_of=lambda k: 0)
    sl = read_batch(
        spark, broker, "t",
        starting_offsets='{"t": {"0": 3}}',
        ending_offsets='{"t": {"0": 7}}',
    )
    assert [(r.offset, bytes(r.value).decode()) for r in
            sorted(sl.collect(), key=lambda r: r.offset)] == [
        (3, "v3"), (4, "v4"), (5, "v5"), (6, "v6"),
    ]
    # append more data, replay the same slice: unchanged
    produce(broker, "t", [_keyed(i) for i in range(10, 15)],
            num_partitions=1, partition_of=lambda k: 0)
    sl2 = read_batch(
        spark, broker, "t",
        starting_offsets='{"t": {"0": 3}}',
        ending_offsets='{"t": {"0": 7}}',
    )
    assert sorted(map(tuple, sl.collect())) == sorted(map(tuple, sl2.collect()))
    assert current_offsets(broker, "t") == {0: 15}


def test_multi_topic_subscribe(spark, tmp_path):
    broker = str(tmp_path / "broker")
    produce(broker, "a", [(None, b"a1"), (None, b"a2")], num_partitions=1,
            partition_of=lambda k: 0)
    produce(broker, "b", [(None, b"b1")], num_partitions=1,
            partition_of=lambda k: 0)
    df = read_batch(spark, broker, "a, b")
    assert sorted((r.topic, bytes(r.value).decode()) for r in df.collect()) == [
        ("a", "a1"), ("a", "a2"), ("b", "b1"),
    ]


def test_partition_pruning_in_plan(spark, tmp_path):
    """topic= and partition= are hive partition columns: a partition
    filter must reach the scan as a PartitionFilter (directory pruning),
    not a post-scan Filter — the analog of Kafka partition assignment."""
    broker = str(tmp_path / "broker")
    produce(broker, "t", [_keyed(i) for i in range(8)], num_partitions=2)
    df = read_batch(spark, broker, "t").filter("partition = 0")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "partition" in plan.split("PartitionFilters", 1)[1][:200]


def test_stream_exactly_once_across_restart(spark, tmp_path):
    """The FlinkKafkaConsumer guarantee: a checkpointed query restarted
    after a stop resumes from its offsets — every produced record
    appears in the sink exactly once, across produce/restart cycles."""
    broker = str(tmp_path / "broker")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    produce(broker, "t", [_keyed(i) for i in range(5)],
            num_partitions=1, partition_of=lambda k: 0)

    def run_once():
        q = (
            read_stream(spark, broker, "t")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    produce(broker, "t", [_keyed(i) for i in range(5, 9)],
            num_partitions=1, partition_of=lambda k: 0)
    run_once()  # restart from the same checkpoint
    got = spark.read.parquet(sink)
    assert _values(got) == sorted(f"v{i}" for i in range(9))
    assert got.count() == 9  # no duplicates, no loss


def test_stream_starting_offsets_latest_skips_log(spark, tmp_path):
    from flink_tornadovm_artifact_spark.streaming import memory_sink_run

    broker = str(tmp_path / "broker")
    produce(broker, "t", [_keyed(i) for i in range(4)],
            num_partitions=1, partition_of=lambda k: 0)
    stream = read_stream(spark, broker, "t", starting_offsets="latest")
    # "latest" resolved to the log end at stream definition: the
    # pre-existing 4 records filter out; records appended after the
    # stream starts flow through
    produce(broker, "t", [_keyed(i) for i in range(4, 6)],
            num_partitions=1, partition_of=lambda k: 0)
    got = memory_sink_run(stream, "kafka_latest_out")
    assert _values(got) == ["v4", "v5"]


def test_stream_multi_partition_exactly_once(spark, tmp_path):
    """Exactly-once must hold across partitions too: records routed to
    3 partitions, a restart mid-log, per-partition offsets dense in the
    sink, no loss or duplication anywhere."""
    broker = str(tmp_path / "broker")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    produce(broker, "t", [_keyed(i) for i in range(12)], num_partitions=3)

    def run_once():
        q = (
            read_stream(spark, broker, "t")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    produce(broker, "t", [_keyed(i) for i in range(12, 20)], num_partitions=3)
    run_once()
    got = spark.read.parquet(sink)
    assert _values(got) == sorted(f"v{i}" for i in range(20))
    for p, rows in _by_partition(got).items():
        assert [o for o, _ in rows] == list(range(len(rows)))


def test_starting_offsets_by_timestamp(spark, tmp_path):
    """offsetsForTimes contract: start at the earliest offset whose
    record timestamp >= the requested epoch-ms; a time past the log
    end resolves to latest (empty read); an absent partition spec
    starts at earliest."""
    import time

    from flink_tornadovm_artifact_spark.sources.kafka_shaped import (
        offsets_for_times,
    )

    broker = str(tmp_path / "broker")
    produce(broker, "t", [_keyed(i) for i in range(4)],
            num_partitions=1, partition_of=lambda k: 0)
    time.sleep(0.01)
    t_mid_ms = int(time.time() * 1000)
    time.sleep(0.01)
    produce(broker, "t", [_keyed(i) for i in range(4, 7)],
            num_partitions=1, partition_of=lambda k: 0)

    assert offsets_for_times(broker, "t", {0: t_mid_ms}) == {0: 4}
    got = read_batch(
        spark, broker, "t",
        starting_offsets_by_timestamp={"t": {"0": t_mid_ms}},
    )
    assert _values(got) == ["v4", "v5", "v6"]
    # beyond log end → latest → empty
    future_ms = int(time.time() * 1000) + 60_000
    assert offsets_for_times(broker, "t", {0: future_ms}) == {0: 7}
    empty = read_batch(
        spark, broker, "t",
        starting_offsets_by_timestamp='{"t": {"0": %d}}' % future_ms,
    )
    assert empty.count() == 0
    # absent partition spec → earliest
    assert offsets_for_times(broker, "t", {}) == {0: 0}


def test_stream_killed_mid_log_exactly_once(spark, tmp_path):
    """Exactly-once across writer GENERATIONS with a mid-log kill: the
    first query instance is stopped after committing only a prefix of
    the log (not after a clean drain, unlike the restart tests above),
    and a second instance on the same checkpoint finishes the rest.
    Every record must land in the sink exactly once with dense offsets
    — the end-to-end guarantee a production stream leans on every time
    an executor dies mid-backfill.

    Determinism: 6 one-record-pair segments, maxFilesPerTrigger=1, and
    a 30 s processing-time trigger — generation 1's first micro-batch
    fires immediately and processes exactly one segment; the stop lands
    in the long idle window before trigger 2 (the assertion tolerates a
    slow test host running a couple more batches, but the full drain
    would need five 30 s windows)."""
    import time

    broker = str(tmp_path / "broker")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    for base in range(0, 12, 2):  # 6 segment files, 2 records each
        produce(broker, "t", [_keyed(i) for i in range(base, base + 2)],
                num_partitions=1, partition_of=lambda k: 0)

    q1 = (
        read_stream(spark, broker, "t", max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="30 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        n1 = 0
        while time.time() < deadline:
            try:
                n1 = spark.read.parquet(sink).count()
            except Exception:  # sink manifest not yet written
                n1 = 0
            if n1 >= 2:
                break
            time.sleep(0.2)
    finally:
        q1.stop()  # the kill: batch 1+ never runs in this generation
    n1 = spark.read.parquet(sink).count()
    assert 2 <= n1 < 12, f"generation 1 should stop mid-log, wrote {n1}"

    q2 = (
        read_stream(spark, broker, "t", max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = spark.read.parquet(sink)
    assert _values(got) == sorted(f"v{i}" for i in range(12))
    assert got.count() == 12  # no duplicate from the killed generation
    (rows,) = _by_partition(got).values()
    assert [o for o, _ in rows] == list(range(12))  # dense offsets
