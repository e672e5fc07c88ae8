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


QUERIES = {"cep_followed_by": cep_followed_by}
