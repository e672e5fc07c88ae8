"""Operator-facade tests: DataSet-style semantics against plain DataFrame
equivalents on the testdata tables (SURVEY.md §2.B-§2.E coverage)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.operators import Dataset
from flink_tornadovm_artifact_spark.tables import load

from .conftest import SF_SMOKE


def _orders(spark):
    return Dataset(load(spark, SF_SMOKE, "orders"))


def _lineitem(spark):
    return Dataset(load(spark, SF_SMOKE, "lineitem"))


def test_map_filter_project(spark):
    ds = _lineitem(spark)
    out = (
        ds.filter(F.col("l_quantity") > 30)
        .project("l_orderkey", "l_extendedprice")
        .map(F.col("l_orderkey"), (F.col("l_extendedprice") * 2).alias("dbl"))
    )
    expected = (
        load(spark, SF_SMOKE, "lineitem")
        .filter("l_quantity > 30")
        .selectExpr("l_orderkey", "l_extendedprice * 2 AS dbl")
    )
    assert out.df.exceptAll(expected).isEmpty()
    assert expected.exceptAll(out.df).isEmpty()


def test_flat_map(spark):
    ds = Dataset(spark.createDataFrame([("a b c",), ("d e",)], "s string"))
    out = ds.flat_map(F.split("s", " "), "tok")
    assert sorted(r.tok for r in out.collect()) == ["a", "b", "c", "d", "e"]


def test_map_partition_pandas(spark):
    ds = _orders(spark)

    def double_price(pdfs):
        for pdf in pdfs:
            yield pd.DataFrame(
                {"o_orderkey": pdf.o_orderkey, "p2": pdf.o_totalprice * 2}
            )

    out = ds.map_partition(double_price, "o_orderkey long, p2 double")
    assert out.count() == ds.count()


def test_grouped_aggregate_and_reduce(spark):
    ds = _lineitem(spark)
    agg = ds.group_by("l_returnflag").aggregate(
        F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    exp = (
        load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, exp.collect()))


def test_reduce_group_sorted(spark):
    """sort_group + reduce_group: the UDF must receive the group ALREADY
    in the secondary-sort order (SortedGrouping iteration contract) — it
    asserts the incoming order instead of re-sorting, so a plan where the
    exchange destroys the sort fails here."""
    ds = _orders(spark)

    def span_sorted(pdf):
        return pd.DataFrame(
            {
                "o_custkey": [pdf.o_custkey.iloc[0]],
                "first_key": [pdf.o_orderkey.iloc[0]],
                "n": [len(pdf)],
                "sorted_in": [bool(pdf.o_orderkey.is_monotonic_increasing)],
            }
        )

    out = (
        ds.group_by("o_custkey")
        .sort_group("o_orderkey")
        .reduce_group(
            span_sorted, "o_custkey long, first_key long, n long, sorted_in boolean"
        )
    )
    rows = out.collect()
    assert rows and all(r.sorted_in for r in rows)
    exp = (
        load(spark, SF_SMOKE, "orders")
        .groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("first_key"), F.count(F.lit(1)).alias("n"))
    )
    assert sorted((r.o_custkey, r.first_key, r.n) for r in rows) == sorted(
        map(tuple, exp.collect())
    )


def test_min_by_max_by_grouped(spark):
    ds = _orders(spark)
    best = ds.group_by("o_custkey").max_by(["o_totalprice", F.lit(0) - F.col("o_orderkey")])
    # deterministic: max price, then min orderkey
    exp = (
        load(spark, SF_SMOKE, "orders")
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("o_custkey").orderBy(
                    F.desc("o_totalprice"), F.asc("o_orderkey")
                )
            ),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    assert sorted(map(tuple, best.collect())) == sorted(map(tuple, exp.collect()))


def test_joins_semi_anti_cross_union(spark):
    cust = Dataset(load(spark, SF_SMOKE, "customer"))
    orders = _orders(spark)
    on = cust.df.c_custkey == orders.df.o_custkey
    n_semi = cust.semi_join(orders, on).count()
    n_anti = cust.anti_join(orders, on).count()
    assert n_semi + n_anti == cust.count()
    region = Dataset(load(spark, SF_SMOKE, "region"))
    nation = Dataset(load(spark, SF_SMOKE, "nation"))
    assert region.cross(nation).count() == region.count() * nation.count()
    assert region.union(region).count() == 2 * region.count()
    assert region.intersect(region).count() == region.count()
    assert region.except_all(region).count() == 0


def test_cogroup(spark):
    cust = Dataset(load(spark, SF_SMOKE, "customer"))
    orders = _orders(spark)

    def pair(key, left, right):
        return pd.DataFrame(
            {"custkey": [key[0]], "n_cust": [len(left)], "n_orders": [len(right)]}
        )

    out = cust.co_group(
        orders, ["c_custkey"], ["o_custkey"], pair, "custkey long, n_cust long, n_orders long"
    )
    total_orders = out.df.agg(F.sum("n_orders")).collect()[0][0]
    assert total_orders == orders.count()


def test_partitioning_ops(spark):
    ds = _orders(spark)
    assert ds.partition_by_hash("o_custkey", n=4).df.rdd.getNumPartitions() == 4
    assert ds.rebalance(3).df.rdd.getNumPartitions() == 3
    rng = ds.partition_by_range("o_orderkey", n=4)
    assert rng.df.rdd.getNumPartitions() <= 4
    custom = ds.partition_custom(F.col("o_orderkey") % 2, 2)
    assert custom.count() == ds.count()
    sp = ds.sort_partition(F.asc("o_orderkey"))
    assert sp.count() == ds.count()


def test_first_and_topk(spark):
    ds = _orders(spark)
    assert ds.first(7).count() == 7
    top = ds.group_by("o_orderpriority").first(2, ["o_totalprice"])
    counts = top.df.groupBy("o_orderpriority").count().collect()
    assert all(r["count"] <= 2 for r in counts)


def test_bulk_iteration(spark):
    start = Dataset(spark.createDataFrame([(0,)], "v long"))
    out = start.iterate(5, lambda df, i: df.select((F.col("v") + 1).alias("v")))
    assert out.collect()[0].v == 5


def test_delta_iteration_terminates_early(spark):
    sol = Dataset(spark.createDataFrame([(1, 10)], "k long, val long"))
    ws = Dataset(spark.createDataFrame([(1,)], "k long"))

    def step(solution, workset, i):
        # one round of work, then empty workset
        return solution, workset.filter(F.lit(False))

    out = sol.iterate_delta(ws, 100, step)
    assert out.count() == 1


def test_zip_with_index_dense_and_preserving(spark):
    """DataSetUtils.zipWithIndex contract: ids are exactly 0..n-1 and
    every input row survives with its data intact — across an
    explicitly multi-partition input so the offset phase is exercised."""
    from flink_tornadovm_artifact_spark.operators.utils import zip_with_index

    df = spark.range(0, 57).repartition(7).withColumn("payload", F.col("id") * 2)
    z = zip_with_index(df)
    rows = z.collect()
    assert sorted(r["index"] for r in rows) == list(range(57))
    assert sorted((r.id, r.payload) for r in rows) == [
        (i, 2 * i) for i in range(57)
    ]


def test_zip_with_unique_id_unique(spark):
    from flink_tornadovm_artifact_spark.operators.utils import (
        zip_with_unique_id,
    )

    df = spark.range(0, 100).repartition(5)
    z = zip_with_unique_id(df)
    ids = [r.unique_id for r in z.collect()]
    assert len(set(ids)) == 100


def test_sample_and_sample_with_size(spark):
    from flink_tornadovm_artifact_spark.operators.utils import (
        sample,
        sample_with_size,
    )

    df = spark.range(0, 1000)
    s = sample(df, fraction=0.2, seed=42)
    n = s.count()
    assert 100 < n < 320  # Bernoulli around 200
    assert s.join(df, "id", "left_anti").count() == 0  # subset
    exact = sample_with_size(df, 37, seed=1)
    got = [r.id for r in exact.collect()]
    assert len(got) == 37 and len(set(got)) == 37
    assert set(got) <= set(range(1000))
    # n larger than the input degrades to the full set
    assert sample_with_size(df, 5000).count() == 1000


def test_temporal_join_as_of_semantics(spark):
    """Temporal table join (Table.createTemporalTableFunction /
    FOR SYSTEM_TIME AS OF): probe picks the latest version at-or-before
    its time; equal timestamps are inclusive; probes before the first
    version drop; a same-(key,time) version pair resolves by the
    tiebreak column (latest write wins)."""
    from flink_tornadovm_artifact_spark.operators.temporal import (
        temporal_join,
    )

    versions = spark.createDataFrame(
        [
            (1, 10, 100, 1),
            (1, 20, 200, 2),
            (1, 20, 250, 3),  # same version time, higher tiebreak wins
            (2, 5, 50, 4),
        ],
        "k long, vts long, val long, vid long",
    )
    probe = spark.createDataFrame(
        [(1, 5, 900), (1, 10, 901), (1, 15, 902), (1, 25, 903), (2, 7, 904)],
        "k long, pts long, pid long",
    )
    got = sorted(
        (r.k, r.pts, r.pid, r.val)
        for r in temporal_join(
            probe,
            versions,
            on="k",
            probe_time="pts",
            version_time="vts",
            version_cols=["val"],
            tiebreak="vid",
        ).collect()
    )
    assert got == [
        # (1,5) dropped: before any version
        (1, 10, 901, 100),  # inclusive at equal time
        (1, 15, 902, 100),
        (1, 25, 903, 250),  # latest version, tiebreak picked vid=3
        (2, 7, 904, 50),
    ]


def test_distributed_cache_file_readable_in_udf(spark, tmp_path):
    """registerCachedFile / getDistributedCache parity: a side file
    shipped once is opened locally inside a mapInPandas body on the
    executors (not the driver) and drives a filter."""
    from flink_tornadovm_artifact_spark.operators.dist_cache import (
        cached_file_path,
        register_cached_file,
    )

    stop = tmp_path / "stopwords.txt"
    stop.write_text("the\nand\nof\n")
    name = register_cached_file(spark, str(stop))

    df = spark.createDataFrame(
        [("the",), ("graph",), ("and",), ("engine",)], "word string"
    )

    def drop_stopwords(batches):
        with open(cached_file_path(name)) as fh:
            stops = {w.strip() for w in fh}
        for pdf in batches:
            yield pdf[~pdf["word"].isin(stops)]

    got = sorted(
        r.word for r in df.mapInPandas(drop_stopwords, df.schema).collect()
    )
    assert got == ["engine", "graph"]


def test_parameter_tool_from_args_grammar():
    """ParameterTool.fromArgs grammar (ParameterTool.java:65-95):
    --/- keys, numeric tokens always values (negative numbers are not
    keys), key followed by another key maps to the NO_VALUE marker."""
    from flink_tornadovm_artifact_spark.operators.params import (
        NO_VALUE_KEY,
        ParameterTool,
    )

    p = ParameterTool.from_args(
        ["--input", "/data/in", "-parallelism", "4", "--offset", "-7",
         "--verbose", "--output", "/data/out", "--flag"]
    )
    assert p.get("input") == "/data/in"
    assert p.get_int("parallelism") == 4
    assert p.get_int("offset") == -7          # negative number is a value
    assert p.get("verbose") == NO_VALUE_KEY   # next token is a key
    assert p.get("flag") == NO_VALUE_KEY      # trailing key
    assert p.get_required("output") == "/data/out"
    assert p.get("missing", "dflt") == "dflt"
    try:
        p.get_required("missing")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_parameter_tool_properties_and_merge(tmp_path):
    from flink_tornadovm_artifact_spark.operators.params import ParameterTool

    f = tmp_path / "job.properties"
    f.write_text("# comment\ninput = /p/in\nretries=3\n\n! note\n")
    p = ParameterTool.from_properties_file(str(f))
    assert p.get("input") == "/p/in" and p.get_int("retries") == 3
    q = ParameterTool.from_args(["--retries", "9"])
    merged = p.merge_with(q)
    assert merged.get_int("retries") == 9     # other side wins
    assert merged.get("input") == "/p/in"
    assert merged.to_map()["retries"] == "9"


def test_temporal_join_null_version_attribute_stays_null(spark):
    """A NULL attribute in the winning version must surface as NULL —
    not inherit the previous version's value (the whole version row is
    picked atomically, as DuckDB's native ASOF JOIN does)."""
    from flink_tornadovm_artifact_spark.operators.temporal import (
        temporal_join,
    )

    versions = spark.createDataFrame(
        [(1, 10, 100), (1, 20, None)], "k long, vts long, val long"
    )
    probe = spark.createDataFrame(
        [(1, 15, 900), (1, 25, 901)], "k long, pts long, pid long"
    )
    got = {
        r.pid: r.val
        for r in temporal_join(
            probe, versions, on="k", probe_time="pts",
            version_time="vts", version_cols=["val"],
        ).collect()
    }
    assert got == {900: 100, 901: None}
