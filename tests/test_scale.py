"""Scale-utility tests: salted aggregation equivalence and bucketed-table
shuffle elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.operators.scale import (
    explain_has_exchange,
    read_bucketed,
    salted_agg,
    write_bucketed,
)
from flink_tornadovm_artifact_spark.tables import load

from .conftest import SF_SMOKE


def test_salted_agg_matches_plain_groupby(spark):
    ev = load(spark, SF_SMOKE, "events")
    got = salted_agg(
        ev,
        ["user_id"],
        {"total": ("sum", "value"), "n": ("count", "value"),
         "lo": ("min", "value"), "hi": ("max", "value")},
        n_salts=8,
    )
    want = ev.groupBy("user_id").agg(
        F.sum("value").alias("total"),
        F.count("value").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    g = {r["user_id"]: r for r in got.collect()}
    w = {r["user_id"]: r for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k]["n"] == w[k]["n"]
        assert g[k]["lo"] == w[k]["lo"]
        assert g[k]["hi"] == w[k]["hi"]
        assert g[k]["total"] == pytest.approx(w[k]["total"], rel=1e-9)


def test_salted_agg_rejects_non_decomposable(spark):
    ev = load(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError):
        salted_agg(ev, ["user_id"], {"m": ("median", "value")})


def test_bucketed_join_skips_shuffle(spark):
    import shutil

    orders = load(spark, SF_SMOKE, "orders")
    cust = load(spark, SF_SMOKE, "customer")
    # clear stale metastore entries AND orphaned warehouse dirs (a table
    # written by a previous in-memory-catalog session leaves files the
    # current catalog doesn't know about)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_cust"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    # disable broadcast so the join strategy decision is bucket-driven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, "b_orders", ["o_custkey"], n_buckets=8)
        write_bucketed(cust, "b_cust", ["c_custkey"], n_buckets=8)
        bo = read_bucketed(spark, "b_orders")
        bc = read_bucketed(spark, "b_cust")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        # bucketed-on-key join plans no hash-partitioning exchange
        assert not explain_has_exchange(joined)
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert explain_has_exchange(plain)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")
