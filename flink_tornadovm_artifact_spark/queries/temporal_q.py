"""Declared query for the temporal (as-of) table join
(``operators/temporal.py`` ← Table.createTemporalTableFunction,
``FT/flink-table/flink-table-api-java/.../Table.java:131``).

Versioned table: each user's ``signup`` events form their version
history (value = the versioned attribute, deduplicated to one version
per (user, timestamp) by highest event id — a deterministic
latest-write-wins). Probe side: ``purchase`` events. Every purchase
picks up the signup value in effect at its event time; purchases before
any signup drop (inner temporal join). The DuckDB oracle is a native
ASOF JOIN — an entirely independent implementation of the same
semantics, which makes the differential check strong.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import temporal_join
from ..tables import load

ORACLE: dict[str, str] = {}
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def temporal_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    dedup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    versions = (
        ev.filter(F.col("event_type") == "signup")
        .withColumn("_rn", F.row_number().over(dedup))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("vts"),
            F.col("value").alias("signup_value"),
        )
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return temporal_join(
        probe,
        versions,
        on="user_id",
        probe_time="purchase_ts",
        version_time="vts",
        version_cols=["signup_value"],
    )


QUERIES["temporal_join_events"] = temporal_join_events
ORACLE["temporal_join_events"] = """
WITH s AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS vts, value AS signup_value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'signup'
),
v AS (SELECT user_id, vts, signup_value FROM s WHERE rn = 1),
f AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(ts AS TIMESTAMP) AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT f.purchase_id, f.user_id, f.purchase_ts, f.purchase_value,
       v.signup_value
FROM f ASOF JOIN v ON f.user_id = v.user_id AND f.purchase_ts >= v.vts
"""
