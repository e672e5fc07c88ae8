"""CEP streaming twin: "A followedBy B within T per key" over a stream.

The stateful mirror of ``queries/cep.py`` — the Spark analog of running
``CEP.pattern(keyedStream, Pattern.begin("a").followedBy("b").within(T))``
(``FT/flink-libraries/flink-cep/.../CEP.java``). Flink's NFA keeps, per
key, the set of partial matches (here: pending A events) and completes a
match when B arrives inside the time constraint; partial matches past
their deadline are pruned on watermark advance. This module implements
that exact lifecycle with ``applyInPandasWithState``:

- keyed state = pending (a_event_id, a_ts) partial matches;
- elements are applied in event-time order (the deterministic stand-in
  for arrival order on a file-replay source, same convention as
  triggers.py);
- a B event completes EVERY pending A within ``T`` — each completed A is
  removed, so each A emits at most once (first-B semantics, identical to
  the batch form's min-over-following-frame);
- pending As whose deadline (a_ts + T) has passed the key's max observed
  event time are pruned — they can never complete on an in-order stream;
  state per key is therefore bounded by the number of As inside one T
  span, the same bound as Flink's NFA partial-match buffer.

Scale note: state is per-key and O(As within T); the shuffle is one
exchange on the key column — the same topology Flink's keyBy gives the
CEP operator.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .core import _interval_ms


def _batch_rows(pdfs):
    """Concatenate a state-function's chunk iterator into one frame in
    (ts, event_id) order with a µs epoch column, or None when the
    invocation carries no data (timeout path). ONE definition of the
    module's ordering and precision conventions — every stateful twin
    routes through it, so a tiebreak or precision change cannot drift
    between twins."""
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return None, None
    rows = pd.concat(chunks, ignore_index=True).sort_values(
        ["ts", "event_id"]
    )
    return rows, rows["ts"].astype("int64") // 1_000


def cep_followed_by_stream(
    events: DataFrame,
    a_type: str = "click",
    b_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit one row per completed (A, first B) match: ``user_id,
    a_event_id, a_ts, b_ts``. ``events`` needs columns event_id, user_id,
    ts, event_type."""
    within_us = _interval_ms(within) * 1000

    def run(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids, ts_list, max_ts = state.get
            pending = list(zip(ids, ts_list))
            max_ts = int(max_ts)
        else:
            pending, max_ts = [], 0
        out: list[tuple[int, int, int]] = []  # (a_event_id, a_ts, b_ts)
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            # full µs precision: the batch twin compares at µs, and a
            # ms truncation would accept pairs sitting within 1 ms past
            # the within() bound (enforced inside _batch_rows)
            for eid, t, typ in zip(
                rows["event_id"], ts_us, rows["event_type"]
            ):
                t = int(t)
                max_ts = max(max_ts, t)
                if typ == a_type:
                    pending.append((int(eid), t))
                elif typ == b_type:
                    matched = [p for p in pending if p[1] + within_us >= t]
                    out.extend((aid, ats, t) for aid, ats in matched)
                    pending = [p for p in pending if p[1] + within_us < t]
            # prune partial matches that can no longer complete in order
            pending = [p for p in pending if p[1] + within_us >= max_ts]
        state.update(
            (
                [p[0] for p in pending],
                [p[1] for p in pending],
                max_ts,
            )
        )
        # state lives while the key can still complete a match; the
        # watermark passing the last deadline cleans it up (timeout API
        # is ms-based — cleanup precision is irrelevant)
        state.setTimeoutTimestamp((max_ts + within_us) // 1000 + 1)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "a_event_id": [o[0] for o in out],
                    "a_ts": pd.to_datetime(
                        [o[1] for o in out], unit="us"
                    ),
                    "b_ts": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                }
            )

    keyed = (
        events.filter(F.col("event_type").isin(a_type, b_type))
        .withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts", "event_type")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, a_event_id long, a_ts timestamp, b_ts timestamp"
        ),
        stateStructType=(
            "a_ids array<long>, a_ts_us array<long>, max_ts long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def cep_times_stream(
    events: DataFrame,
    a_type: str = "click",
    n: int = 3,
    within: str = "1 day",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_times`` — the
    ``Pattern.begin("a").times(n).within(T)`` count quantifier. Keyed
    state is the trailing-T window of A timestamps (Flink's NFA keeps
    the same partial-match buffer for a times() pattern); each arriving
    A first evicts expired entries, then joins the window, and emits
    when it is the n-th-or-later element — exactly the batch form's
    inclusive RANGE frame [t - T, t].

    State per key is bounded by the As inside one T span; cleanup uses
    the same deadline timeout as ``cep_followed_by_stream``.

    ORDERING CAVEAT: events are sorted by event time only WITHIN each
    micro-batch. A late-but-within-watermark A arriving in a later
    batch is counted against a window that already advanced past it —
    its frame may include later-timestamped peers and may have lost
    entries an earlier, larger timestamp already evicted — which can
    diverge from the batch oracle and from Flink's NFA (which buffers
    by event time up to the watermark). The twins therefore assume
    per-key in-order arrival across micro-batches (exact for the
    file-replay sources used here; a fully late-tolerant variant would
    buffer rows in state and process them at watermark timeout).
    """
    within_us = _interval_ms(within) * 1000

    def run(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (win_list, max_ts) = state.get
            window = [int(t) for t in win_list]
            max_ts = int(max_ts)
        else:
            window, max_ts = [], 0
        out: list[tuple[int, int, int]] = []  # (a_event_id, a_ts, count)
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            # process same-timestamp events as ONE group: the batch
            # RANGE frame is value-defined, so every peer at time t sees
            # ALL peers at t in its frame — counting one-by-one would
            # give the earlier peers a smaller count
            for t, grp in rows.assign(_t=ts_us.values).groupby("_t", sort=True):
                t = int(t)
                max_ts = max(max_ts, t)
                window = [w for w in window if w >= t - within_us]
                window.extend([t] * len(grp))
                if len(window) >= n:
                    out.extend(
                        (int(eid), t, len(window))
                        for eid in grp["event_id"]
                    )
        state.update((window, max_ts))
        state.setTimeoutTimestamp((max_ts + within_us) // 1000 + 1)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "a_event_id": [o[0] for o in out],
                    "a_ts": pd.to_datetime([o[1] for o in out], unit="us"),
                    "n_in_window": [o[2] for o in out],
                }
            )

    keyed = (
        events.filter(F.col("event_type") == a_type)
        .withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, a_event_id long, a_ts timestamp, n_in_window long"
        ),
        stateStructType="win_ts_us array<long>, max_ts long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def cep_one_or_more_stream(
    events: DataFrame,
    a_type: str = "click",
    b_type: str = "purchase",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_one_or_more`` — the
    ``begin(A).oneOrMore().consecutive().greedy().next(B)`` looping
    quantifier. Keyed state is the NFA's looping-state summary: the
    trailing run of consecutive A events (length + first timestamp).
    Any non-A event resets it (strict contiguity); a B with a non-empty
    run emits one match carrying the full run — the greedy collapse of
    the reference's per-prefix match set.

    The pattern has no within() bound, so state never expires on a
    deadline — it is O(1) per key (three longs), the degenerate best
    case of Flink's NFA buffer. Processes the FULL event stream (every
    type can break a run), in (ts, event_id) order within each
    micro-batch; like the other twins it assumes per-key in-order
    arrival ACROSS micro-batches (see module caveat on
    cep_times_stream).
    """

    def run(key, pdfs, state: GroupState):
        if state.exists:
            run_len, first_ts, last_seen = (int(x) for x in state.get)
        else:
            run_len, first_ts, last_seen = 0, 0, 0
        out = []  # (b_event_id, b_ts, a_first_ts, run_len)
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ in zip(rows["event_id"], ts_us, rows["event_type"]):
                t = int(t)
                last_seen = max(last_seen, t)
                if typ == a_type:
                    if run_len == 0:
                        first_ts = t
                    run_len += 1
                else:
                    if typ == b_type and run_len >= 1:
                        out.append((int(eid), t, first_ts, run_len))
                    run_len, first_ts = 0, 0
        state.update((run_len, first_ts, last_seen))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "b_event_id": [o[0] for o in out],
                    "b_ts": pd.to_datetime([o[1] for o in out], unit="us"),
                    "a_first_ts": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "run_len": [o[3] for o in out],
                }
            )

    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, b_event_id long, b_ts timestamp, "
            "a_first_ts timestamp, run_len long"
        ),
        stateStructType="run_len long, first_ts_us long, last_seen_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_times_range_stream(
    events: DataFrame,
    a_type: str = "click",
    b_type: str = "purchase",
    n_from: int = 2,
    n_to: int = 4,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_times_range`` — the
    ``times(from, to).consecutive().greedy().next(B)`` bounded-range
    quantifier. Identical looping-run state to
    ``cep_one_or_more_stream`` with the range check at match time (the
    NFA's accepting condition); same O(1)-per-key state and the same
    cross-batch in-order assumption.
    """

    def run(key, pdfs, state: GroupState):
        if state.exists:
            run_len, first_ts, last_seen = (int(x) for x in state.get)
        else:
            run_len, first_ts, last_seen = 0, 0, 0
        out = []
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ in zip(rows["event_id"], ts_us, rows["event_type"]):
                t = int(t)
                last_seen = max(last_seen, t)
                if typ == a_type:
                    if run_len == 0:
                        first_ts = t
                    run_len += 1
                else:
                    if typ == b_type and n_from <= run_len <= n_to:
                        out.append((int(eid), t, first_ts, run_len))
                    run_len, first_ts = 0, 0
        state.update((run_len, first_ts, last_seen))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "b_event_id": [o[0] for o in out],
                    "b_ts": pd.to_datetime([o[1] for o in out], unit="us"),
                    "a_first_ts": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "run_len": [o[3] for o in out],
                }
            )

    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, b_event_id long, b_ts timestamp, "
            "a_first_ts timestamp, run_len long"
        ),
        stateStructType="run_len long, first_ts_us long, last_seen_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_optional_stream(
    events: DataFrame,
    v_type: str = "view",
    c_type: str = "click",
    b_type: str = "purchase",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_optional`` — the
    ``begin(V).next(C).optional().next(B)`` 0-or-1 quantifier under
    strict contiguity. Keyed state is the last TWO events' (type, id):
    the optional middle element means a B matches on (V, C, B) or
    (·, V, B). O(1) per key; same cross-batch in-order assumption as
    the other twins.
    """

    def run(key, pdfs, state: GroupState):
        if state.exists:
            p1t, p1i, p2t, p2i = state.get
        else:
            p1t, p1i, p2t, p2i = "", 0, "", 0
        out = []  # (b_event_id, b_ts, view_id, click_id_or_None)
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ in zip(rows["event_id"], ts_us, rows["event_type"]):
                eid, t = int(eid), int(t)
                if typ == b_type:
                    if p1t == c_type and p2t == v_type:
                        out.append((eid, t, int(p2i), int(p1i)))
                    elif p1t == v_type:
                        out.append((eid, t, int(p1i), None))
                p2t, p2i, p1t, p1i = p1t, p1i, typ, eid
        state.update((p1t, p1i, p2t, p2i))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "b_event_id": [o[0] for o in out],
                    "b_ts": pd.to_datetime([o[1] for o in out], unit="us"),
                    "view_event_id": [o[2] for o in out],
                    "click_event_id": pd.array(
                        [o[3] for o in out], dtype="Int64"
                    ),
                }
            )

    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, b_event_id long, b_ts timestamp, "
            "view_event_id long, click_event_id long"
        ),
        stateStructType="p1t string, p1i long, p2t string, p2i long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_after_match_stream(
    events: DataFrame,
    strategy: str = "no_skip",
    a_type: str = "click",
    b_type: str = "purchase",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_after_match`` — the
    AfterMatchSkipStrategy family over the looping
    ``A.oneOrMore().consecutive().greedy().next(B)`` pattern
    (``flink-cep/.../nfa/aftermatch/AfterMatchSkipStrategy.java``).

    Keyed state is the full start-timestamp list of the trailing
    consecutive A-run — exactly the NFA's partial-match buffer for this
    pattern (one live start per run position; Flink keeps the same
    per-start entries in its SharedBuffer). When B arrives, the
    candidate matches are the run's suffixes; the strategy picks which
    survive:

    - ``no_skip``: all start positions;
    - ``skip_past_last_event``: only the maximal match (position 0);
    - ``skip_to_last``: position 0 plus the final single-A suffix.

    State is O(run length) — bounded by the longest consecutive A-run,
    the same bound as the reference's buffer (no within() bound on this
    pattern, so no deadline pruning). Same cross-batch in-order
    assumption as the other twins (module caveat on cep_times_stream).
    """
    from ..queries.cep import SKIP_STRATEGIES

    if strategy not in SKIP_STRATEGIES:
        raise ValueError(
            f"unknown AfterMatchSkipStrategy {strategy!r}; "
            f"expected one of {SKIP_STRATEGIES}"
        )

    def run(key, pdfs, state: GroupState):
        starts: list[int] = list(state.get[0]) if state.exists else []
        out = []  # (b_event_id, b_ts, a_start_ts, match_len)
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ in zip(rows["event_id"], ts_us, rows["event_type"]):
                t = int(t)
                if typ == a_type:
                    starts.append(t)
                else:
                    if typ == b_type and starts:
                        n = len(starts)
                        if strategy == "no_skip":
                            picks = range(n)
                        elif strategy == "skip_past_last_event":
                            picks = [0]
                        else:  # skip_to_last
                            picks = [0] if n == 1 else [0, n - 1]
                        for i in picks:
                            out.append((int(eid), t, starts[i], n - i))
                    starts = []
        state.update((starts,))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "b_event_id": [o[0] for o in out],
                    "b_ts": pd.to_datetime([o[1] for o in out], unit="us"),
                    "a_start_ts": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "match_len": [o[3] for o in out],
                }
            )

    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, b_event_id long, b_ts timestamp, "
            "a_start_ts timestamp, match_len long"
        ),
        stateStructType="starts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_one_or_more_until_stream(
    events: DataFrame,
    until_x: float = 123.0,
    a_type: str = "click",
    b_type: str = "purchase",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_one_or_more_until`` —
    ``oneOrMore().consecutive().until(value > X).next(B)``. Same
    O(1)-per-key looping-run summary as ``cep_one_or_more_stream``
    plus one ``triggered`` bit: the until() condition is evaluated as
    each A arrives (the reference checks it BEFORE consuming the
    element into the loop), and a triggered run can never complete —
    its B is swallowed and the run resets.
    """

    def run(key, pdfs, state: GroupState):
        if state.exists:
            run_len, first_ts, triggered = (int(x) for x in state.get)
        else:
            run_len, first_ts, triggered = 0, 0, 0
        out = []
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ, val in zip(
                rows["event_id"], ts_us, rows["event_type"], rows["value"]
            ):
                t = int(t)
                if typ == a_type:
                    if run_len == 0:
                        first_ts = t
                    run_len += 1
                    if val is not None and float(val) > until_x:
                        triggered = 1
                else:
                    if typ == b_type and run_len >= 1 and not triggered:
                        out.append((int(eid), t, first_ts, run_len))
                    run_len, first_ts, triggered = 0, 0, 0
        state.update((run_len, first_ts, triggered))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "b_event_id": [o[0] for o in out],
                    "b_ts": pd.to_datetime([o[1] for o in out], unit="us"),
                    "a_first_ts": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "run_len": [o[3] for o in out],
                }
            )

    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, b_event_id long, b_ts timestamp, "
            "a_first_ts timestamp, run_len long"
        ),
        stateStructType="run_len long, first_ts_us long, triggered long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_followed_by_any_stream(
    events: DataFrame,
    a_type: str = "click",
    b_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_followed_by_any`` —
    ``followedByAny`` (non-deterministic relaxed contiguity): every B
    pairs with EVERY pending A inside the within() bound, and — unlike
    ``cep_followed_by_stream``'s head-match — a completed A stays
    pending for later Bs until its deadline passes. State is the same
    pending-(a_event_id, a_ts) buffer with the same deadline pruning
    and watermark-timeout cleanup; only the completion rule differs
    (emit without remove), exactly how the reference's NFA models the
    strategy (the partial match branches instead of advancing).
    """
    within_us = _interval_ms(within) * 1000

    def run(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids, ts_list, max_ts = state.get
            pending = list(zip(ids, ts_list))
            max_ts = int(max_ts)
        else:
            pending, max_ts = [], 0
        out: list[tuple[int, int, int, int]] = []
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ in zip(
                rows["event_id"], ts_us, rows["event_type"]
            ):
                t = int(t)
                max_ts = max(max_ts, t)
                if typ == a_type:
                    pending.append((int(eid), t))
                elif typ == b_type:
                    out.extend(
                        (aid, int(eid), ats, t)
                        for aid, ats in pending
                        if ats + within_us >= t
                    )
            pending = [p for p in pending if p[1] + within_us >= max_ts]
        state.update(
            (
                [p[0] for p in pending],
                [p[1] for p in pending],
                max_ts,
            )
        )
        state.setTimeoutTimestamp((max_ts + within_us) // 1000 + 1)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "a_event_id": [o[0] for o in out],
                    "b_event_id": [o[1] for o in out],
                    "a_ts": pd.to_datetime([o[2] for o in out], unit="us"),
                    "b_ts": pd.to_datetime([o[3] for o in out], unit="us"),
                }
            )

    keyed = (
        events.filter(F.col("event_type").isin(a_type, b_type))
        .withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts", "event_type")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, a_event_id long, b_event_id long, "
            "a_ts timestamp, b_ts timestamp"
        ),
        stateStructType=(
            "ids array<long>, ts_list array<long>, max_ts long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def cep_next_stream(
    events: DataFrame,
    a_type: str = "view",
    b_type: str = "purchase",
    watermark: str = "10 minutes",
    negate: bool = False,
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_next`` (strict
    contiguity) and, with ``negate=True``, of ``cep_not_next`` (strict
    absence). Keyed state is the single previous event — the NFA's
    one-slot buffer for a strict-contiguity edge. Each arriving event
    resolves the pending A: for ``next`` it emits the (A, B) pair when
    it IS a B; for ``notNext`` it emits the A when it is NOT a B. An A
    still pending at stream end never resolves (the batch form's
    next_type IS NULL rows are a bounded-input artifact a stream cannot
    observe — documented asymmetry, tested)."""

    def run(key, pdfs, state: GroupState):
        if state.exists:
            prev_id, prev_ts, prev_is_a = (int(x) for x in state.get)
        else:
            prev_id, prev_ts, prev_is_a = 0, 0, 0
        out = []
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ in zip(
                rows["event_id"], ts_us, rows["event_type"]
            ):
                t = int(t)
                if prev_is_a:
                    is_b = typ == b_type
                    if is_b and not negate:
                        out.append((prev_id, int(eid), prev_ts, t))
                    elif not is_b and negate:
                        # no matched B exists: the b columns are NULL,
                        # not fabricated sentinels a consumer could
                        # mistake for a real event
                        out.append((prev_id, None, prev_ts, None))
                prev_id, prev_ts, prev_is_a = (
                    int(eid),
                    t,
                    int(typ == a_type),
                )
        state.update((prev_id, prev_ts, prev_is_a))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "a_event_id": [o[0] for o in out],
                    "b_event_id": pd.array(
                        [o[1] for o in out], dtype="Int64"
                    ),
                    "a_ts": pd.to_datetime([o[2] for o in out], unit="us"),
                    "b_ts": pd.to_datetime([o[3] for o in out], unit="us"),
                }
            )

    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, a_event_id long, b_event_id long, "
            "a_ts timestamp, b_ts timestamp"
        ),
        stateStructType="prev_id long, prev_ts long, prev_is_a long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_not_followed_by_stream(
    events: DataFrame,
    a_type: str = "error",
    b_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_not_followed_by`` — the
    absence pattern, which is exactly the reference's partial-match
    TIMEOUT path (``TimedOutPartialMatchHandler`` /
    ``PatternTimeoutFunction``): an A emits when its within() deadline
    passes without a B. Pending As resolve three ways:

    - a B arrives with ``b_ts <= deadline`` → matched, dropped silently
      (the pattern is absence — a completed followedBy is a NON-match);
    - a B arrives past the deadline → the A's absence is already
      decided, emit immediately (the batch form's first-B-too-late row);
    - the event-time watermark passes the deadline → emit on the state
      timeout (the NFA pruning its timed-out partial match).

    State is the pending-A buffer bounded by one within() span — the
    same bound as cep_followed_by_stream — and the same per-key
    in-order arrival assumption (module caveat on cep_times_stream).
    """
    within_us = _interval_ms(within) * 1000

    def run(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, ts_list = state.get
            pending = list(zip(ids, ts_list))
        else:
            pending = []
        out: list[tuple[int, int]] = []  # (a_event_id, a_ts)
        wm_us = state.getCurrentWatermarkMs() * 1000
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ in zip(
                rows["event_id"], ts_us, rows["event_type"]
            ):
                t = int(t)
                if typ == a_type:
                    pending.append((int(eid), t))
                elif typ == b_type:
                    # in-order: this is the FIRST B for every pending A
                    out.extend(
                        p for p in pending if p[1] + within_us < t
                    )
                    pending = []
        # watermark past the deadline: absence confirmed (timeout path)
        expired = [p for p in pending if p[1] + within_us < wm_us]
        out.extend(expired)
        pending = [p for p in pending if p[1] + within_us >= wm_us]
        if pending:
            state.update(
                ([p[0] for p in pending], [p[1] for p in pending])
            )
            state.setTimeoutTimestamp(
                min(p[1] for p in pending) // 1000 + within_us // 1000 + 1
            )
        elif state.exists:
            # drained: drop the entry entirely — an empty-array update
            # with no timeout armed would park dead state in the store
            # for every key the job ever saw
            state.remove()
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "a_event_id": [o[0] for o in out],
                    "a_ts": pd.to_datetime([o[1] for o in out], unit="us"),
                }
            )

    # NO type filter: the absence timeout must advance on EVERY event
    # in the stream, and a type predicate — whichever side of
    # withWatermark it is written on — gets pushed below the
    # EventTimeWatermark node by Catalyst (it does not reference ts),
    # starving the watermark whenever only non-pattern traffic flows.
    # The run function ignores other types itself; this matches the
    # reference, whose CEP operator consumes the full keyed stream.
    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, a_event_id long, a_ts timestamp"
        ),
        stateStructType="ids array<long>, ts_list array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def cep_group_followed_by_stream(
    events: DataFrame,
    v_type: str = "view",
    c_type: str = "click",
    times_n: int = 2,
    within: str = "7 days",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_group_followed_by`` —
    the quantified GroupPattern. Keyed state composes the two
    primitive states the batch form composes as passes: the one-slot
    previous event (group detection, as in cep_next_stream) plus the
    trailing window of group-match timestamps (the times() quantifier,
    as in cep_times_stream), pruned to the within() span — state is
    O(group matches in one span). Group matches completing at the same
    VIEW timestamp are counted as ONE peer group (the batch RANGE
    frame is value-defined, so equal-ts peers see each other —
    cep_times_stream's peer-grouping discipline); like the other
    twins, cross-batch arrival is assumed per-key in-order. That
    assumption extends to equal-timestamp peers SPLIT ACROSS
    micro-batches: the earlier batch's peer has already emitted (or
    not) by the time the later one arrives, so its row cannot be
    revised with the larger peer count the batch RANGE frame would
    report — same class of divergence as the module-wide ordering
    caveat on cep_times_stream."""
    from itertools import groupby as _groupby

    within_us = _interval_ms(within) * 1000

    def run(key, pdfs, state: GroupState):
        if state.exists:
            prev_id, prev_ts, prev_is_v, ids, hist = state.get
            prev_id, prev_ts, prev_is_v = (
                int(prev_id), int(prev_ts), int(prev_is_v),
            )
            pairs = list(zip(ids, hist))
        else:
            prev_id, prev_ts, prev_is_v, pairs = 0, 0, 0, []
        out = []
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            # phase 1: detect group matches with the one-slot state;
            # strict contiguity means v_ts is non-decreasing in
            # detection order, so the phase-2 groupby is a single pass
            new_pairs = []  # (v_id, c_id, v_ts)
            for eid, t, typ in zip(
                rows["event_id"], ts_us, rows["event_type"]
            ):
                t = int(t)
                if prev_is_v and typ == c_type:
                    new_pairs.append((prev_id, int(eid), prev_ts))
                prev_id, prev_ts, prev_is_v = (
                    int(eid), t, int(typ == v_type),
                )
            # phase 2: the times() quantifier over the group-match
            # stream, equal-v_ts peers processed as one group (each
            # peer's RANGE frame contains all of them)
            for v_ts, grp_it in _groupby(new_pairs, key=lambda p: p[2]):
                grp = list(grp_it)
                pairs = [p for p in pairs if p[1] >= v_ts - within_us]
                total = len(pairs) + len(grp)
                if total >= times_n:
                    out.extend(
                        (v_id, c_id, v_ts, total)
                        for v_id, c_id, _ in grp
                    )
                pairs.extend((v_id, v_ts) for v_id, _c, _t in grp)
        state.update(
            (
                prev_id, prev_ts, prev_is_v,
                [p[0] for p in pairs], [p[1] for p in pairs],
            )
        )
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "v_event_id": [o[0] for o in out],
                    "c_event_id": [o[1] for o in out],
                    "group_ts": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "n_groups": [o[3] for o in out],
                }
            )

    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, v_event_id long, c_event_id long, "
            "group_ts timestamp, n_groups long"
        ),
        stateStructType=(
            "prev_id long, prev_ts long, prev_is_v long, "
            "ids array<long>, hist array<long>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_allow_combinations_stream(
    events: DataFrame,
    a_type: str = "click",
    b_type: str = "purchase",
    max_run: int | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``queries/cep.py:cep_allow_combinations`` —
    ``begin(A).oneOrMore().allowCombinations().next(B)``. Keyed state
    is identical to ``cep_one_or_more_stream`` (the trailing
    consecutive A-run: length + first timestamp — three longs); the
    COMBINATIONS branching needs no extra state because every match of
    the pattern is a subset of that run containing its last element
    (strict next(B) anchors the end; NO_SKIP starts an attempt at
    every a_i). When a B closes a run of length k ≤ ``max_run`` the
    twin emits the same 2^(k-1) (combo_mask, n_matched) rows the batch
    enumeration produces — the exponential fan-out happens at EMIT
    time, never in state, so state stays O(1) per key while the NFA's
    combination branching is reproduced exactly. Runs longer than
    ``max_run`` emit nothing; the default is imported from the batch
    module's COMB_MAX_RUN so the two caps cannot desynchronize (a
    hardcoded twin cap would silently diverge if the batch cap moved,
    and the batch/stream differential runs well under the cap).
    """
    if max_run is None:
        from ..queries.cep import COMB_MAX_RUN

        max_run = COMB_MAX_RUN

    def run(key, pdfs, state: GroupState):
        if state.exists:
            run_len, first_ts, last_seen = (int(x) for x in state.get)
        else:
            run_len, first_ts, last_seen = 0, 0, 0
        out = []  # (b_event_id, b_ts, a_first_ts, run_len, mask)
        rows, ts_us = _batch_rows(pdfs)
        if rows is not None:
            for eid, t, typ in zip(rows["event_id"], ts_us, rows["event_type"]):
                t = int(t)
                last_seen = max(last_seen, t)
                if typ == a_type:
                    if run_len == 0:
                        first_ts = t
                    run_len += 1
                else:
                    if typ == b_type and 1 <= run_len <= max_run:
                        for mask in range(1 << (run_len - 1)):
                            out.append(
                                (int(eid), t, first_ts, run_len, mask)
                            )
                    run_len, first_ts = 0, 0
        state.update((run_len, first_ts, last_seen))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "b_event_id": [o[0] for o in out],
                    "b_ts": pd.to_datetime([o[1] for o in out], unit="us"),
                    "a_first_ts": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "run_len": [o[3] for o in out],
                    "combo_mask": [o[4] for o in out],
                    "n_matched": [o[4].bit_count() + 1 for o in out],
                }
            )

    keyed = events.withWatermark("ts", watermark).select(
        "user_id", "event_id", "ts", "event_type"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        run,
        outputStructType=(
            "user_id long, b_event_id long, b_ts timestamp, "
            "a_first_ts timestamp, run_len long, combo_mask long, "
            "n_matched int"
        ),
        stateStructType="run_len long, first_ts_us long, last_seen_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
