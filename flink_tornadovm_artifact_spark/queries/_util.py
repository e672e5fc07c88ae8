"""Shared helpers for the declared query set.

Oracle-exact aggregation: the verification driver hash-compares Spark vs
DuckDB with floats rounded to 4 decimals. A double SUM over 10^5+ rows can
differ between engines by more than 1e-4 (different accumulation order), so
every large SUM here is computed in DECIMAL — exact and identical in both
engines — and cast back to DOUBLE at the end. Source money columns have 2
decimal digits, so a (18,2)-scale cast is lossless. AVG is derived from the
exact decimal sum divided by the count, written with the same expression
shape on both sides so the double division is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for any testdata magnitude; scale 4 covers 2-decimal money
# columns and 4-decimal rates losslessly.
#
# Why DECIMAL and not a ×10000 scaled-BIGINT sum (which benches ~1.6×
# faster locally): at 100 TB lineitem is ~6e11 rows; a scaled-long sum
# reaches ~6e20 and silently wraps past the int64 max (9.2e18) with ANSI
# off, while Spark's decimal sum auto-widens the result type
# (decimal(18,4) → decimal(28,4), max 1e24) and stays exact. The decimal
# overhead is the price of overflow-correctness at scale.
DEC = "decimal(18,4)"


def dsum(col: str | Column) -> Column:
    """Exact decimal sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB rendering of :func:`dsum` (identical math)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def davg(col: str | Column) -> Column:
    """Exact-sum-based average: CAST(decimal_sum AS DOUBLE) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def davg_sql(expr: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr})"
    )


def evict_stale_session_entries(cache: dict, spark) -> None:
    """Drop session-scoped memo entries from other (stopped) sessions.

    The cross-query work-sharing memos are keyed ``(applicationId,
    sf_dir, ...)`` so a new session can never read another session's
    state — but without eviction the dict itself leaks: entries from
    stopped sessions accumulate for the life of the Python process, and
    any persisted DataFrames they hold keep their CacheManager entries
    pinned for as long as that (possibly still-running) session lives.
    Called at every memo lookup: one dict scan, no Spark jobs.

    Values may be a DataFrame or a tuple/list containing DataFrames;
    each is unpersisted on eviction (best-effort — a frame whose
    session already stopped has no cache left to free, and unpersist
    on a dead context raises, hence the swallow).
    """
    from pyspark.sql import DataFrame as _DF

    app = spark.sparkContext.applicationId
    for key in [k for k in cache if k[0] != app]:
        val = cache.pop(key)
        frames = val if isinstance(val, (tuple, list)) else (val,)
        for f in frames:
            if isinstance(f, _DF):
                try:
                    f.unpersist(blocking=False)
                except Exception:
                    pass


def plan_memo(fn):
    """Memoize a query's BUILT DataFrame per (session, corpus).

    Plan-construction work-sharing, the ``_VITERBI_DF_CACHE`` discipline
    generalized (round 13, guide §1.2 driver-side): PySpark resolves the
    logical plan eagerly per transformation, so a deep query pays its
    whole Catalyst analysis chain again on EVERY invocation — measured
    0.7-1.9 s of pure driver time for the widest panels. The memo caches
    the lazy DataFrame object only: every action on it still recomputes
    from the parquet inputs (or from the separately documented
    session-lifetime memo frames its plan already referenced — the memo
    adds no materialization of its own and registers nothing with the
    CacheManager).

    Only apply to queries whose build is (a) deterministic per
    (session, sf_dir) and (b) free of private eager state UNLESS that
    state is itself a documented memo artifact (the _BPE_CACHE
    checkpoint-chain precedent). Keyed (applicationId, sf_dir); stale
    sessions evicted via evict_stale_session_entries.
    """
    import functools

    cache: dict[tuple[str, str], object] = {}

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        evict_stale_session_entries(cache, spark)
        key = (spark.sparkContext.applicationId, sf_dir)
        hit = cache.get(key)
        if hit is None:
            hit = cache[key] = fn(spark, sf_dir)
        return hit

    wrapped._plan_memo_cache = cache  # introspection for tests
    return wrapped


def twin_batch(pdfs, key, last_ts_us: int, last_eid: int):
    """Materialize one keyed group's micro-batch for a streaming twin and
    enforce the family's ordering contract as a MECHANISM, not prose.

    ``applyInPandasWithState`` hands the group's micro-batch as an
    iterator of Arrow chunks (split at
    ``spark.sql.execution.arrow.maxRecordsPerBatch``) in no guaranteed
    time order, so per-chunk sorting is NOT a per-batch sort. This helper
    concatenates ALL chunks first and sorts the whole batch once by
    (ts, event_id) — the batch queries' exact window order.

    Across batches the twins require a per-key event-time-ordered feed
    (a log-compacted topic / sorted replay provides it; otherwise compose
    ``streaming.order.ordered_events_stream`` upstream). That contract is
    asserted LOUDLY here: a batch whose first event is at or before the
    key's stored (last_ts_us, last_eid) position raises instead of
    silently miscounting. Returns None for an empty batch.
    """
    import pandas as pd

    parts = [p for p in pdfs if len(p)]
    if not parts:
        return None
    pdf = parts[0] if len(parts) == 1 else pd.concat(parts)
    pdf = pdf.sort_values(["ts", "event_id"])
    first = (
        int(pdf["ts"].astype("int64").iloc[0]) // 1_000,
        int(pdf["event_id"].iloc[0]),
    )
    if last_eid >= 0 and first <= (last_ts_us, last_eid):
        raise ValueError(
            f"streaming-twin ordering contract violated for key {key}: "
            f"batch starts at (ts_us, event_id)={first} but state is "
            f"already past ({last_ts_us}, {last_eid}); feed this twin a "
            "per-key event-time-ordered stream (compose "
            "streaming.order.ordered_events_stream upstream)"
        )
    return pdf
