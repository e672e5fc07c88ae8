"""Functional JDBC connector tests (SURVEY.md §2.A connectors row;
reference FT/flink-connectors/flink-connector-jdbc/ JdbcInputFormat /
JdbcOutputFormat).

Runs against embedded Apache Derby — bundled with PySpark's own jars —
so this is a real write→SQL-engine→read round trip, not a mock. The
degradation pin for genuinely-absent connector packages (Kafka, Avro)
stays in test_sources_plans.py.
"""

from __future__ import annotations

from flink_tornadovm_artifact_spark.sources.jdbc import (
    DERBY_DRIVER,
    derby_url,
    jdbc_read,
    jdbc_write,
)


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.25)],
        "id bigint, s string, v double",
    )
    url = derby_url(str(tmp_path / "db"))
    jdbc_write(src, url, "RT", driver=DERBY_DRIVER)
    back = jdbc_read(spark, url, "RT", driver=DERBY_DRIVER)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_jdbc_partitioned_read_splits(spark, tmp_path):
    """JdbcInputFormat's parameterized-split contract: the partitioned
    read must produce num_partitions concurrent range scans covering all
    rows exactly once."""
    url = derby_url(str(tmp_path / "db"))
    jdbc_write(
        spark.range(1000).selectExpr("id", "id % 7 as grp"),
        url,
        "BIG",
        driver=DERBY_DRIVER,
    )
    part = jdbc_read(
        spark,
        url,
        "BIG",
        partition_column="ID",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 1000
    assert part.selectExpr("sum(id)").collect()[0][0] == 999 * 1000 // 2


def test_jdbc_filter_pushes_into_remote_query(spark, tmp_path):
    """Predicate pushdown: a filter on a JDBC relation must compile into
    the generated remote SQL (PushedFilters in the scan node), so the
    database ships only matching rows — the 100 TB discipline applied to
    external tables."""
    url = derby_url(str(tmp_path / "db"))
    jdbc_write(spark.range(100).selectExpr("id"), url, "F", driver=DERBY_DRIVER)
    df = jdbc_read(spark, url, "F", driver=DERBY_DRIVER).filter("id > 90")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(id,90)" in plan, plan
    assert df.count() == 9
