"""Type-matrix micro-fixtures (FIXTURES.md F8): map + global reduce +
grouped reduce per type shape, each differentially checked vs DuckDB.

Rebuild analog of the reference's ~45 self-verifying type programs under
``FT/flink-examples/.../tornadovm/`` (TestCopyIntegers/Floats/Doubles,
TestTupleInt/Double, TestTuple3DiffInput/Output, TestTuple4Tuple4,
TestReductionsNestedTuple, TestTupleWithArrayField): the reference pins
per-type marshalling through its acceleration layer; the Spark rebuild
pins per-type expression semantics and result types through Catalyst and
Arrow. Float/double comparisons go through the oracle mirror's
round(…,4) canonicalization — the reference's 0.01-tolerance convention
(TestMatrixMultiplication.java:88-96) tightened to 1e-4.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.operators import Dataset

from .oracle import compare

N = 97
_I = list(range(N))


def _arrow(fixture: str) -> pa.Table:
    if fixture == "t_scalar_int":
        return pa.table({"v": pa.array([(i * 7) % 23 - 11 for i in _I], pa.int32())})
    if fixture == "t_scalar_long":
        return pa.table(
            {"v": pa.array([(i * 7919) % 1000003 - 500000 for i in _I], pa.int64())}
        )
    if fixture == "t_scalar_float":
        # quarters are exact in float32 — no representation drift
        return pa.table({"v": pa.array([i / 4 - 10.0 for i in _I], pa.float32())})
    if fixture == "t_scalar_double":
        return pa.table({"v": pa.array([i * 0.25 - 12.0 for i in _I], pa.float64())})
    if fixture == "t_tuple2":
        return pa.table(
            {
                "f0": pa.array([i % 7 for i in _I], pa.int32()),
                "f1": pa.array([i * 0.5 for i in _I], pa.float64()),
            }
        )
    if fixture == "t_tuple3_mixed":
        return pa.table(
            {
                "f0": pa.array([i % 5 for i in _I], pa.int32()),
                "f1": pa.array([i * 0.25 for i in _I], pa.float64()),
                "f2": pa.array([i * 1000003 for i in _I], pa.int64()),
            }
        )
    if fixture == "t_tuple4":
        return pa.table(
            {
                "f0": pa.array([i * 0.25 for i in _I], pa.float64()),
                "f1": pa.array([i * 0.5 for i in _I], pa.float64()),
                "f2": pa.array([i * 0.75 for i in _I], pa.float64()),
                "f3": pa.array([i + 0.125 for i in _I], pa.float64()),
            }
        )
    if fixture == "t_nested":
        return pa.table(
            {
                "f0": pa.array([i % 4 for i in _I], pa.int32()),
                "f1": pa.array(
                    [{"x": i * 0.5, "y": i * 0.25} for i in _I],
                    pa.struct([("x", pa.float64()), ("y", pa.float64())]),
                ),
                "f2": pa.array([i * 31 for i in _I], pa.int64()),
            }
        )
    if fixture == "t_array_field":
        return pa.table(
            {
                "f0": pa.array(
                    [[i * 0.25 + j * 0.5 for j in range(8)] for i in _I],
                    pa.list_(pa.float64()),
                ),
                "f1": pa.array([i * 0.125 for i in _I], pa.float64()),
            }
        )
    raise KeyError(fixture)


_SPARK_SCHEMA = {
    "t_scalar_int": "v int",
    "t_scalar_long": "v long",
    "t_scalar_float": "v float",
    "t_scalar_double": "v double",
    "t_tuple2": "f0 int, f1 double",
    "t_tuple3_mixed": "f0 int, f1 double, f2 long",
    "t_tuple4": "f0 double, f1 double, f2 double, f3 double",
    "t_nested": "f0 int, f1 struct<x:double, y:double>, f2 long",
    "t_array_field": "f0 array<double>, f1 double",
}

_ARR_SUM = "aggregate(f0, 0.0d, (acc, e) -> acc + e)"

#: fixture -> (map, global reduce, grouped reduce); each entry is
#: (Dataset-operator builder, equivalent DuckDB SQL over view `t`).
_CHECKS = {
    "t_scalar_int": (
        (
            lambda ds: ds.map((F.col("v") * 2 + 1).alias("m")),
            "SELECT v * 2 + 1 AS m FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum("v").alias("s"), F.min("v").alias("lo"), F.max("v").alias("hi")
            ),
            "SELECT CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS lo, MAX(v) AS hi FROM t",
        ),
        (
            lambda ds: ds.group_by((F.col("v") % 5).alias("k")).aggregate(
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
            ),
            "SELECT v % 5 AS k, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n"
            " FROM t GROUP BY 1",
        ),
    ),
    "t_scalar_long": (
        (
            lambda ds: ds.map((F.col("v") * 2 + 1).alias("m")),
            "SELECT v * 2 + 1 AS m FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum("v").alias("s"), F.min("v").alias("lo"), F.max("v").alias("hi")
            ),
            "SELECT CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS lo, MAX(v) AS hi FROM t",
        ),
        (
            lambda ds: ds.group_by((F.col("v") % 7).alias("k")).aggregate(
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
            ),
            "SELECT v % 7 AS k, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n"
            " FROM t GROUP BY 1",
        ),
    ),
    "t_scalar_float": (
        (
            lambda ds: ds.map((F.col("v").cast("double") * 2 + 1).alias("m")),
            "SELECT CAST(v AS DOUBLE) * 2 + 1 AS m FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum("v").alias("s"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            ),
            "SELECT SUM(v) AS s, MIN(v) AS lo, MAX(v) AS hi FROM t",
        ),
        (
            lambda ds: ds.group_by(
                F.floor(F.col("v") / 10).cast("long").alias("k")
            ).aggregate(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")),
            "SELECT CAST(FLOOR(v / 10) AS BIGINT) AS k, SUM(v) AS s,"
            " COUNT(*) AS n FROM t GROUP BY 1",
        ),
    ),
    "t_scalar_double": (
        (
            lambda ds: ds.map((F.col("v") * 2 + 1).alias("m")),
            "SELECT v * 2 + 1 AS m FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum("v").alias("s"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            ),
            "SELECT SUM(v) AS s, MIN(v) AS lo, MAX(v) AS hi FROM t",
        ),
        (
            lambda ds: ds.group_by(
                F.floor(F.col("v") / 10).cast("long").alias("k")
            ).aggregate(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")),
            "SELECT CAST(FLOOR(v / 10) AS BIGINT) AS k, SUM(v) AS s,"
            " COUNT(*) AS n FROM t GROUP BY 1",
        ),
    ),
    "t_tuple2": (
        (
            lambda ds: ds.map(
                (F.col("f0") + 1).alias("m0"), (F.col("f1") * 2).alias("m1")
            ),
            "SELECT f0 + 1 AS m0, f1 * 2 AS m1 FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum("f0").alias("s0"),
                F.sum("f1").alias("s1"),
                F.min("f0").alias("lo0"),
                F.max("f1").alias("hi1"),
            ),
            "SELECT CAST(SUM(f0) AS BIGINT) AS s0, SUM(f1) AS s1,"
            " MIN(f0) AS lo0, MAX(f1) AS hi1 FROM t",
        ),
        (
            lambda ds: ds.group_by("f0").aggregate(
                F.sum("f1").alias("s1"), F.count(F.lit(1)).alias("n")
            ),
            "SELECT f0, SUM(f1) AS s1, COUNT(*) AS n FROM t GROUP BY f0",
        ),
    ),
    "t_tuple3_mixed": (
        (
            lambda ds: ds.map(
                (F.col("f0") + F.col("f2")).alias("m02"),
                (F.col("f1") / 2).alias("m1"),
            ),
            "SELECT f0 + f2 AS m02, f1 / 2 AS m1 FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum("f0").alias("s0"),
                F.avg("f1").alias("a1"),
                F.max("f2").alias("hi2"),
            ),
            "SELECT CAST(SUM(f0) AS BIGINT) AS s0, AVG(f1) AS a1,"
            " MAX(f2) AS hi2 FROM t",
        ),
        (
            lambda ds: ds.group_by("f0").aggregate(
                F.sum("f2").alias("s2"), F.avg("f1").alias("a1")
            ),
            "SELECT f0, CAST(SUM(f2) AS BIGINT) AS s2, AVG(f1) AS a1"
            " FROM t GROUP BY f0",
        ),
    ),
    "t_tuple4": (
        (
            lambda ds: ds.map(
                (F.col("f0") + F.col("f1")).alias("m01"),
                (F.col("f2") * F.col("f3")).alias("m23"),
            ),
            "SELECT f0 + f1 AS m01, f2 * f3 AS m23 FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum("f0").alias("s0"),
                F.sum("f1").alias("s1"),
                F.sum("f2").alias("s2"),
                F.sum("f3").alias("s3"),
            ),
            "SELECT SUM(f0) AS s0, SUM(f1) AS s1, SUM(f2) AS s2,"
            " SUM(f3) AS s3 FROM t",
        ),
        (
            lambda ds: ds.group_by(
                F.floor(F.col("f0")).cast("long").alias("k")
            ).aggregate(F.sum("f3").alias("s3"), F.count(F.lit(1)).alias("n")),
            "SELECT CAST(FLOOR(f0) AS BIGINT) AS k, SUM(f3) AS s3,"
            " COUNT(*) AS n FROM t GROUP BY 1",
        ),
    ),
    "t_nested": (
        (
            lambda ds: ds.map(
                (F.col("f0") * 2).alias("m0"),
                (F.col("f1.x") + F.col("f1.y")).alias("mxy"),
                (F.col("f2") - 1).alias("m2"),
            ),
            "SELECT f0 * 2 AS m0, f1.x + f1.y AS mxy, f2 - 1 AS m2 FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum("f1.x").alias("sx"),
                F.sum("f1.y").alias("sy"),
                F.sum("f2").alias("s2"),
                F.count(F.lit(1)).alias("n"),
            ),
            "SELECT SUM(f1.x) AS sx, SUM(f1.y) AS sy,"
            " CAST(SUM(f2) AS BIGINT) AS s2, COUNT(*) AS n FROM t",
        ),
        (
            lambda ds: ds.group_by("f0").aggregate(
                F.sum("f1.x").alias("sx"), F.max("f1.y").alias("hy")
            ),
            "SELECT f0, SUM(f1.x) AS sx, MAX(f1.y) AS hy FROM t GROUP BY f0",
        ),
    ),
    "t_array_field": (
        (
            lambda ds: ds.map(
                F.transform("f0", lambda e: e * 2).alias("m0"),
                (F.expr(_ARR_SUM) + F.col("f1")).alias("dotp"),
            ),
            "SELECT list_transform(f0, e -> e * 2) AS m0,"
            " list_aggregate(f0, 'sum') + f1 AS dotp FROM t",
        ),
        (
            lambda ds: ds.reduce(
                F.sum(F.expr(_ARR_SUM)).alias("s_all"),
                F.sum("f1").alias("s1"),
            ),
            "SELECT SUM(list_aggregate(f0, 'sum')) AS s_all, SUM(f1) AS s1 FROM t",
        ),
        (
            lambda ds: ds.group_by(
                (F.col("f1") * 8).cast("long").__mod__(4).alias("k")
            ).aggregate(
                F.sum(F.expr(_ARR_SUM)).alias("s_all"),
                F.count(F.lit(1)).alias("n"),
            ),
            "SELECT CAST(f1 * 8 AS BIGINT) % 4 AS k,"
            " SUM(list_aggregate(f0, 'sum')) AS s_all, COUNT(*) AS n"
            " FROM t GROUP BY 1",
        ),
    ),
}

_OPS = ("map", "global_reduce", "grouped_reduce")


@pytest.fixture(scope="module")
def type_con():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.parametrize("op_idx", range(3), ids=_OPS)
@pytest.mark.parametrize("fixture", sorted(_CHECKS))
def test_type_matrix(fixture, op_idx, spark, type_con):
    tbl = _arrow(fixture)
    type_con.register("t", tbl)
    sdf = spark.createDataFrame(tbl.to_pandas(), _SPARK_SCHEMA[fixture])
    builder, sql = _CHECKS[fixture][op_idx]
    out = builder(Dataset(sdf)).df
    ok, msg = compare(out, type_con, sql)
    assert ok, f"{fixture}/{_OPS[op_idx]}: {msg}"
