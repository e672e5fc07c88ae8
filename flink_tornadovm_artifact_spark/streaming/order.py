"""Watermark-buffered per-key event-time ordering stage.

The stateful streaming twins (queries/behavior.py, queries/temporal_q.py)
carry a cross-batch ordering contract: each user's feed must arrive in
event-time order, because the chaining / first-hit / latest-wins state
transitions are order-sensitive. A replayable per-key-ordered log (a
log-compacted Kafka topic, a sorted file feed) provides that for free;
an arbitrary shuffled arrival does NOT. This module ships the mechanism
the twins' docstrings promise: a reorder stage that buffers each key's
events in keyed state and releases them in (ts, event_id) order once the
event-time watermark has passed them — the same buffered-sort a Flink
``KeyedProcessFunction`` implements with a MapState + event-time timers
(reference idiom: FT flink-streaming-java .../functions/
KeyedProcessFunction.java registering timers per buffered timestamp).

Semantics (standard watermark completeness, identical to every
append-mode windowed aggregate in Structured Streaming):

- every emitted row satisfies ``ts <= watermark`` at emission time, and
  per key the emission order is globally (ts, event_id)-ascending —
  late rows older than the watermark were already dropped by Spark
  before reaching the stage, and everything between the previous and
  the current watermark is in the buffer when it flushes;
- rows newer than the current watermark stay in state until the
  watermark passes them; a stalled watermark (end of a bounded replay)
  leaves the tail buffered, exactly as an open session window would.
  Advance the watermark (any newer event on any key — the watermark is
  global) to flush.

Scale: per-key state is bounded by ``delay`` × the key's event rate
(a time bound, not a stream-length bound — the same boundedness class
as a sliding-window aggregate); the stage adds one shuffle on the key,
which downstream ``applyInPandasWithState`` twins reuse (same grouping
key, no second shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ordered_events_stream"]

#: feed columns every twin consumes, in contract order
_BASE_COLS = ("ts", "user_id", "event_id", "event_type")


def ordered_events_stream(
    events_stream: DataFrame,
    delay: str = "1 hour",
    with_value: bool = False,
) -> DataFrame:
    """Reorder an events STREAM with columns (ts timestamp, user_id long,
    event_id long, event_type string[, value double]) into per-user
    (ts, event_id) order, releasing rows once the event-time watermark
    (``delay`` behind the observed max ts) has passed them. Compose as
    ``twin(ordered_events_stream(raw))`` when the upstream feed is not
    already per-key ordered."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = _BASE_COLS + (("value",) if with_value else ())
    out_schema = (
        "ts timestamp, user_id long, event_id long, event_type string"
        + (", value double" if with_value else "")
    )
    state_schema = (
        "ts_us array<long>, eid array<long>, et array<string>"
        + (", val array<double>" if with_value else "")
    )

    def reorder(key, pdfs, state: GroupState):
        buf = list(zip(*state.get)) if state.exists else []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us = pdf["ts"].astype("int64") // 1_000
            vals = pdf["value"] if with_value else us  # placeholder iter
            for t, e, et, v in zip(us, pdf["event_id"], pdf["event_type"], vals):
                row = (int(t), int(e), et) + (
                    (float(v),) if with_value else ()
                )
                buf.append(row)
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1_000
        buf.sort(key=lambda r: (r[0], r[1]))
        n_ready = 0
        while n_ready < len(buf) and buf[n_ready][0] <= wm_us:
            n_ready += 1
        ready, rest = buf[:n_ready], buf[n_ready:]
        if rest:
            state.update(tuple(list(c) for c in zip(*rest)))
            # the Flink event-time-timer analog: a key with a pending
            # buffer must be re-invoked when the watermark passes its
            # earliest event even if no new rows arrive for the key —
            # applyInPandasWithState only calls keys present in a batch,
            # so the flush is driven by an event-time TIMEOUT pinned at
            # the earliest buffered timestamp (strictly above the
            # current watermark, as the API requires).
            state.setTimeoutTimestamp(max(rest[0][0] // 1_000, wm_ms + 1))
        elif state.exists:
            state.remove()
        if ready:
            out = {
                "ts": [pd.Timestamp(r[0], unit="us") for r in ready],
                "user_id": [key[0]] * len(ready),
                "event_id": [r[1] for r in ready],
                "event_type": [r[2] for r in ready],
            }
            if with_value:
                out["value"] = [r[3] for r in ready]
            yield pd.DataFrame(out)

    return (
        events_stream.select(*cols)
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            reorder,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
