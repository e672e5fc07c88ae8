"""Window triggers and evictors (SURVEY.md §2.G "Triggers / evictors").

The reference ships a trigger/evictor DSL for windowed streams:

- ``triggers/CountTrigger.java`` — fire every ``maxCount`` elements
  (count cleared on fire, window contents NOT purged);
- ``triggers/DeltaTrigger.java`` — fire when ``delta(lastFiredElement,
  newElement) > threshold`` (the fired element becomes the new basis);
- ``triggers/PurgingTrigger.java`` — wrapper turning any FIRE into
  FIRE_AND_PURGE;
- ``evictors/CountEvictor.java:28`` — keep only the last ``maxCount``
  buffered elements at fire time;
- ``evictors/TimeEvictor.java`` — keep only elements within
  ``windowSize`` of the buffer's max timestamp;
- ``evictors/DeltaEvictor.java`` — evict elements whose ``delta(element,
  lastElement) >= threshold``.

Structured Streaming has no trigger DSL — its windows fire on watermark
advance only — so this module emulates the pane lifecycle with
``applyInPandasWithState``: keyed state per (key, window) holds the
element buffer plus the trigger's own state, elements are applied in
event-time order, and each FIRE applies the evictor to the buffer and
emits one aggregate row. On window cleanup (event-time timeout at window
end + watermark), Count/Delta trigger state is dropped WITHOUT firing —
matching Flink, where those triggers' un-fired remainder is silently
cleared at cleanup time — while ContinuousEventTimeTrigger emits one
final pane first (``fire_on_cleanup``): Flink registers an event-time
timer at ``window.maxTimestamp()`` whose ``onEventTime`` returns FIRE
(ContinuousEventTimeTrigger.java), so the window-end pane always fires.

Scale note: this is the escape hatch for Flink-parity trigger semantics,
priced accordingly (per-element Python loop inside Arrow batches, state
bounded by window contents — same bound as Flink's pane buffer). The hot
path for plain event-time windows remains the native ``window()``
aggregate in streaming/core.py, which fires on watermark like Flink's
default EventTimeTrigger.
"""

from __future__ import annotations

import math
from collections.abc import Iterable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .core import _interval_ms

CONTINUE, FIRE = 0, 1


# ---------------------------------------------------------------------------
# Triggers. Protocol: on_element(st, ts_ms, value) -> CONTINUE | FIRE,
# mutating the two generic state slots st["count"] / st["last"] that ride
# in the Spark state row across micro-batches.
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class CountTrigger:
    """triggers/CountTrigger.java: FIRE every ``n`` elements; the count
    resets on fire but the window buffer keeps accumulating."""

    n: int
    purge: bool = False

    def on_element(self, st: dict, ts_ms: int, value: float) -> int:
        st["count"] += 1
        if st["count"] >= self.n:
            st["count"] = 0
            return FIRE
        return CONTINUE


@dataclass(frozen=True)
class ContinuousEventTimeTrigger:
    """triggers/ContinuousEventTimeTrigger.java: fire repeatedly every
    ``interval`` of EVENT time within the window. Flink registers an
    event-time timer per boundary AND one at ``window.maxTimestamp()``;
    the emulation fires as elements carry event time across each
    interval-aligned boundary, and — because interval timers also fire on
    watermark advance with no further elements — emits one final pane at
    window cleanup (``fire_on_cleanup=True``), so the window-end pane is
    never lost. In-order streams see the same pane contents as Flink for
    every boundary an element crosses plus the final pane; a boundary
    that no element and no watermark-advance reaches before cleanup is
    folded into that final pane rather than fired separately.
    Processing-time triggers (ProcessingTimeTrigger,
    ContinuousProcessingTimeTrigger) map NATIVELY to Structured
    Streaming's micro-batch cadence — ``writeStream.trigger(
    processingTime=...)`` — and are deliberately not emulated here:
    wall-clock firing is nondeterministic under replay, which is the
    exact property this deterministic test harness excludes."""

    interval: str  # e.g. "2 minutes"
    purge: bool = False
    #: Flink's window.maxTimestamp() timer: FIRE once more at cleanup.
    fire_on_cleanup: bool = True

    def on_element(self, st: dict, ts_ms: int, value: float) -> int:
        step = _interval_ms(self.interval)
        if st["last"] is None or math.isnan(st["last"]):
            # first element arms the timer at the next aligned boundary
            st["last"] = float(ts_ms - ts_ms % step + step)
            return CONTINUE
        if ts_ms >= st["last"]:
            st["last"] = float(ts_ms - ts_ms % step + step)
            return FIRE
        return CONTINUE


@dataclass(frozen=True)
class DeltaTrigger:
    """triggers/DeltaTrigger.java with the scalar-difference delta
    function: the first element becomes the basis; FIRE when
    ``|value - basis| > threshold`` and rebase to the firing element."""

    threshold: float
    purge: bool = False

    def on_element(self, st: dict, ts_ms: int, value: float) -> int:
        if st["last"] is None or math.isnan(st["last"]):
            st["last"] = value
            return CONTINUE
        if abs(value - st["last"]) > self.threshold:
            st["last"] = value
            return FIRE
        return CONTINUE


def purging(trigger):
    """triggers/PurgingTrigger.java: same fire condition, FIRE_AND_PURGE."""
    return type(trigger)(
        **{**trigger.__dict__, "purge": True}
    )


# ---------------------------------------------------------------------------
# Evictors. Protocol: evict(ts_list, val_list) -> (ts_list, val_list),
# applied to the buffer BEFORE the window function (evictBefore default).
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class CountEvictor:
    """evictors/CountEvictor.java:28 — keep the last ``n`` elements."""

    n: int

    def evict(self, ts: list[int], vals: list[float]):
        return ts[-self.n :], vals[-self.n :]


@dataclass(frozen=True)
class TimeEvictor:
    """evictors/TimeEvictor.java — keep elements within ``keep`` of the
    buffer's max timestamp."""

    keep: str  # e.g. "5 minutes"

    def evict(self, ts: list[int], vals: list[float]):
        if not ts:
            return ts, vals
        # Strict cutoff: TimeEvictor.java:73-77 evicts ts <= evictCutoff
        # (cutoff = max - windowSize), i.e. keeps only ts strictly after
        # it — an element exactly at the cutoff is evicted.
        lo = max(ts) - _interval_ms(self.keep)
        kept = [i for i, t in enumerate(ts) if t > lo]
        return [ts[i] for i in kept], [vals[i] for i in kept]


@dataclass(frozen=True)
class DeltaEvictor:
    """evictors/DeltaEvictor.java — evict elements whose scalar delta to
    the LAST buffered element is >= threshold."""

    threshold: float

    def evict(self, ts: list[int], vals: list[float]):
        if not vals:
            return ts, vals
        basis = vals[-1]
        kept = [i for i, v in enumerate(vals) if abs(v - basis) < self.threshold]
        return [ts[i] for i in kept], [vals[i] for i in kept]


# ---------------------------------------------------------------------------
# The emulation runner.
# ---------------------------------------------------------------------------
def windowed_trigger_agg(
    events: DataFrame,
    trigger,
    evictor=None,
    size: str = "10 minutes",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window whose panes fire per ``trigger`` with
    ``evictor`` applied to the buffer at each fire (count/sum emitted).

    Elements are applied in event-time order within each micro-batch
    (Flink applies arrival order; a parquet-file replay has no arrival
    order, so event time is the deterministic stand-in). Rows are keyed
    by (key, window start); state times out — silently, like Flink's
    window cleanup for custom triggers — once the watermark passes the
    window end.
    """
    size_ms = _interval_ms(size)

    def run(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # Window cleanup. ContinuousEventTimeTrigger fires one final
            # pane here (Flink's window.maxTimestamp() timer); Count/
            # Delta triggers drop their un-fired remainder silently,
            # matching Flink's cleanup of custom-trigger windows.
            final = None
            if getattr(trigger, "fire_on_cleanup", False) and state.exists:
                ts_buf, val_buf, _count, _last = state.get
                ts_buf, val_buf = list(ts_buf), list(val_buf)
                if val_buf:
                    _e_ts, e_vals = (
                        evictor.evict(ts_buf, val_buf)
                        if evictor
                        else (ts_buf, val_buf)
                    )
                    final = pd.DataFrame(
                        {
                            key_col: [key[0]],
                            "win_start": [key[1]],
                            "cnt": [len(e_vals)],
                            "sum_value": [sum(e_vals)],
                        }
                    )
            state.remove()
            if final is not None:
                yield final
            return
        if state.exists:
            ts_buf, val_buf, count, last = state.get
            ts_buf, val_buf = list(ts_buf), list(val_buf)
        else:
            ts_buf, val_buf, count, last = [], [], 0, None
        st = {"count": count, "last": last}
        fired: list[tuple[int, float]] = []
        chunks = [p for p in pdfs if len(p)]
        rows = pd.concat(chunks, ignore_index=True) if chunks else None
        if rows is not None:
            rows = rows.sort_values(ts_col)
            ts_ms_all = rows[ts_col].astype("int64") // 1_000_000
            # epoch-aligned window end drives the cleanup timer — derived
            # from the data, not the key datetime, so it is tz-independent
            first = int(ts_ms_all.iloc[0])
            state.setTimeoutTimestamp(first - first % size_ms + size_ms)
            for ts_ms, v in zip(ts_ms_all, rows[value_col].astype(float)):
                ts_buf.append(int(ts_ms))
                val_buf.append(float(v))
                if trigger.on_element(st, int(ts_ms), float(v)) == FIRE:
                    e_ts, e_vals = (
                        evictor.evict(ts_buf, val_buf) if evictor else (ts_buf, val_buf)
                    )
                    fired.append((len(e_vals), sum(e_vals)))
                    if getattr(trigger, "purge", False):
                        ts_buf, val_buf = [], []
        state.update(
            (
                ts_buf,
                val_buf,
                st["count"],
                float("nan") if st["last"] is None else st["last"],
            )
        )
        if fired:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(fired),
                    "win_start": [key[1]] * len(fired),
                    "cnt": [f[0] for f in fired],
                    "sum_value": [f[1] for f in fired],
                }
            )

    # Epoch-aligned tumbling assignment (tz-independent, same alignment
    # as F.window under a UTC session); the raw ts column stays in the
    # projection so the watermark survives for EventTimeTimeout.
    win_start = F.timestamp_millis(
        (F.unix_millis(F.col(ts_col)) / size_ms).cast("long") * size_ms
    )
    keyed = events.withWatermark(ts_col, watermark).select(
        key_col, win_start.alias("win_start"), ts_col, value_col
    )
    return keyed.groupBy(key_col, "win_start").applyInPandasWithState(
        run,
        outputStructType=(
            f"{key_col} long, win_start timestamp, cnt long, sum_value double"
        ),
        stateStructType=(
            "ts_buf array<long>, val_buf array<double>, count long, last double"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
