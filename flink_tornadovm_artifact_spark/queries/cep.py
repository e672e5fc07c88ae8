"""CEP mini-surface: "A followedBy B within T per key" (batch form).

The reference ships the full Flink CEP library
(``FT/flink-libraries/flink-cep/src/main/java/org/apache/flink/cep/CEP.java``,
``.../pattern/Pattern.java``): sequence patterns with time constraints
over keyed streams — ``Pattern.begin("a").followedBy("b").within(T)``.
Spark has no MATCH_RECOGNIZE, but the core followedBy-within shape is
expressible with one analytic window pass, which is also the plan you
want at 100 TB: one shuffle on the key, one sort per partition, no
self-join and no per-key collect.

Semantics implemented (and mirrored by the streaming twin in
``streaming/cep.py``):

- relaxed contiguity (``followedBy``, not ``next``): other events may
  sit between A and B;
- each A matches the FIRST B that follows it in stream order — Flink's
  ``AfterMatchSkipStrategy`` head-match behavior for this 2-step
  pattern — provided that B arrives within ``T`` of A's event time;
- "follows" is stream order (ts, event_id), not strict timestamp
  inequality, matching CEP's order-based buffer.

One A → at most one output row, so output cardinality is bounded by the
number of A events. The window frame (min over following rows) is
computed identically by Spark and DuckDB, so the query is fully
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load

ORACLE: dict[str, str] = {}

#: Pattern parameters: clicks followed by a purchase within 30 minutes.
A_TYPE, B_TYPE, WITHIN = "click", "purchase", "30 minutes"


def cep_followed_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    # Only the two pattern symbols participate; the filter pushes to the
    # scan, so the window pass sorts A∪B rows only, not the full stream.
    ab = ev.filter(F.col("event_type").isin(A_TYPE, B_TYPE))
    following = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    first_b_ts = F.min(
        F.when(F.col("event_type") == B_TYPE, F.col("ts"))
    ).over(following)
    return (
        ab.withColumn("b_ts", first_b_ts)
        .filter(
            (F.col("event_type") == A_TYPE)
            & F.col("b_ts").isNotNull()
            & (F.col("b_ts") <= F.col("ts") + F.expr(f"INTERVAL {WITHIN}"))
        )
        .select(
            F.col("event_id").alias("a_event_id"),
            "user_id",
            F.col("ts").alias("a_ts"),
            "b_ts",
        )
    )


# The CAST(ts AS TIMESTAMP) truncates DuckDB's nanosecond parquet
# timestamps to microseconds — the same truncation tables.load applies on
# the Spark side — so the within-T boundary comparison agrees between
# engines (a ns-precision comparison could flip a pair sitting within
# 1 µs of the boundary).
ORACLE["cep_followed_by"] = f"""
WITH ab AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
  WHERE event_type IN ('{A_TYPE}', '{B_TYPE}')
),
scanned AS (
  SELECT event_id, user_id, ts, event_type,
         MIN(CASE WHEN event_type = '{B_TYPE}' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS b_ts
  FROM ab
)
SELECT event_id AS a_event_id, user_id, ts AS a_ts, b_ts
FROM scanned
WHERE event_type = '{A_TYPE}' AND b_ts IS NOT NULL
  AND b_ts <= ts + INTERVAL {WITHIN}
"""


# ---------------------------------------------------------------------------
# times(n).within(T): the count quantifier (Pattern.java times()). A
# match completes at every A event that is the n-th-or-later A within
# the trailing T for its key — one analytic RANGE frame with an
# INTERVAL bound on the event-time ordering. Value-defined frame bounds
# mean same-timestamp peers land in the frame identically in both
# engines, and an interval frame sidesteps timezone semantics entirely
# (the testdata's µs timestamps surface as TIMESTAMP_NTZ, which the
# epoch conversion functions reject).
# ---------------------------------------------------------------------------
TIMES_N, TIMES_WITHIN = 3, "1 DAY"  # 3 clicks in a day
#: (chosen so the match fires at every SF — sf0.001: 19 rows, sf0.01:
#: 154 — a vacuously-green 0-row check would not verify the frame
#: logic at all; see the round-2 q19 verdict finding)


def cep_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    a = ev.filter(F.col("event_type") == A_TYPE)
    n_in_window = F.expr(
        f"""count(1) OVER (
              PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL {TIMES_WITHIN} PRECEDING AND CURRENT ROW
            )"""
    )
    return (
        a.withColumn("n_in_window", n_in_window)
        .filter(F.col("n_in_window") >= TIMES_N)
        .select(
            F.col("event_id").alias("a_event_id"),
            "user_id",
            F.col("ts").alias("a_ts"),
            "n_in_window",
        )
    )


ORACLE["cep_times"] = f"""
WITH a AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = '{A_TYPE}'
),
counted AS (
  SELECT event_id, user_id, ts,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL {TIMES_WITHIN} PRECEDING AND CURRENT ROW
         ) AS n_in_window
  FROM a
)
SELECT event_id AS a_event_id, user_id, ts AS a_ts, n_in_window
FROM counted WHERE n_in_window >= {TIMES_N}
"""


# ---------------------------------------------------------------------------
# notFollowedBy(...).within(T): the absence pattern (Pattern.java
# notFollowedBy — legal only under a within() bound, which is exactly
# what makes it decidable). Same one-pass first-B scan as
# cep_followed_by, negated: emit the A events whose first following B
# is absent or out of the time bound.
# ---------------------------------------------------------------------------
NOT_A_TYPE, NOT_B_TYPE, NOT_WITHIN = "error", "purchase", "30 minutes"


def cep_not_followed_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    ab = ev.filter(F.col("event_type").isin(NOT_A_TYPE, NOT_B_TYPE))
    following = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    first_b_ts = F.min(
        F.when(F.col("event_type") == NOT_B_TYPE, F.col("ts"))
    ).over(following)
    return (
        ab.withColumn("b_ts", first_b_ts)
        .filter(
            (F.col("event_type") == NOT_A_TYPE)
            & (
                F.col("b_ts").isNull()
                | (F.col("b_ts") > F.col("ts") + F.expr(f"INTERVAL {NOT_WITHIN}"))
            )
        )
        .select(
            F.col("event_id").alias("a_event_id"),
            "user_id",
            F.col("ts").alias("a_ts"),
        )
    )


ORACLE["cep_not_followed_by"] = f"""
WITH ab AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
  WHERE event_type IN ('{NOT_A_TYPE}', '{NOT_B_TYPE}')
),
scanned AS (
  SELECT event_id, user_id, ts, event_type,
         MIN(CASE WHEN event_type = '{NOT_B_TYPE}' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS b_ts
  FROM ab
)
SELECT event_id AS a_event_id, user_id, ts AS a_ts
FROM scanned
WHERE event_type = '{NOT_A_TYPE}'
  AND (b_ts IS NULL OR b_ts > ts + INTERVAL {NOT_WITHIN})
"""


# ---------------------------------------------------------------------------
# next(): strict contiguity (Pattern.java next — "A immediately
# followed by B", ANY intervening event for the key breaks the match).
# The window therefore scans the FULL per-key stream, not just the
# pattern symbols: LEAD over (ts, event_id) order.
# ---------------------------------------------------------------------------
NEXT_A_TYPE, NEXT_B_TYPE = "view", "purchase"


def cep_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(order))
        .withColumn("next_id", F.lead("event_id").over(order))
        .withColumn("next_ts", F.lead("ts").over(order))
        .filter(
            (F.col("event_type") == NEXT_A_TYPE)
            & (F.col("next_type") == NEXT_B_TYPE)
        )
        .select(
            F.col("event_id").alias("a_event_id"),
            F.col("next_id").alias("b_event_id"),
            "user_id",
            F.col("ts").alias("a_ts"),
            F.col("next_ts").alias("b_ts"),
        )
    )


ORACLE["cep_next"] = f"""
WITH scanned AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         LEAD(event_type) OVER w AS next_type,
         LEAD(event_id) OVER w AS next_id,
         LEAD(CAST(ts AS TIMESTAMP)) OVER w AS next_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
)
SELECT event_id AS a_event_id, next_id AS b_event_id, user_id,
       ts AS a_ts, next_ts AS b_ts
FROM scanned
WHERE event_type = '{NEXT_A_TYPE}' AND next_type = '{NEXT_B_TYPE}'
"""


QUERIES = {
    "cep_followed_by": cep_followed_by,
    "cep_times": cep_times,
    "cep_not_followed_by": cep_not_followed_by,
    "cep_next": cep_next,
}
