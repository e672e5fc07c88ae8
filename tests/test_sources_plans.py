"""Source/sink surface tests + physical-plan assertions (pushdown,
pruning, broadcast) — the 'is this the plan you'd want at 100 TB' gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.plans import (
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)
from flink_tornadovm_artifact_spark.queries.relational import (
    q01_filter_project,
    q04_tpch_q3,
    q06_broadcast_join,
)
from flink_tornadovm_artifact_spark.sources import (
    from_collection,
    generate_sequence,
    read_csv_file,
    read_text_file,
    write_as_csv,
    write_as_formatted_text,
    write_as_text,
)

from .conftest import SF_ORACLE


def test_csv_roundtrip_with_include_fields(spark, tmp_path):
    df = from_collection(
        spark,
        [(1, "a", 1.5), (2, "b", 2.5)],
        "id long, name string, score double",
    )
    p = str(tmp_path / "csv")
    write_as_csv(df, p, mode="overwrite", field_delimiter="|")
    # full-schema read with a projection mask keeping fields 0 and 2
    back = read_csv_file(
        spark, p, "id long, name string, score double",
        include_fields="101", field_delimiter="|",
    )
    assert back.columns == ["id", "score"]
    assert sorted(map(tuple, back.collect())) == [(1, 1.5), (2, 2.5)]


def test_text_sinks_and_sources(spark, tmp_path):
    df = from_collection(spark, [(1, "x"), (2, "y")], "k long, v string")
    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    write_as_text(df, p1)
    write_as_formatted_text(df, p2, "k=%d v=%s")
    lines1 = sorted(r.value for r in read_text_file(spark, p1).collect())
    lines2 = sorted(r.value for r in read_text_file(spark, p2).collect())
    assert lines1 == ["1,x", "2,y"]
    assert lines2 == ["k=1 v=x", "k=2 v=y"]


def test_generate_sequence(spark):
    df = generate_sequence(spark, 1, 100, partitions=4)
    assert df.count() == 100
    assert df.agg(F.sum("id")).collect()[0][0] == 5050


def test_q01_pushdown_and_pruning(spark):
    df = q01_filter_project(spark, SF_ORACLE)
    filters = pushed_filters(df)
    assert any("l_quantity" in f for f in filters), filters
    cols = read_schema_columns(df)
    # scan must read only the 3 referenced columns, not all 11
    assert cols and set(cols[0]) == {"l_orderkey", "l_extendedprice", "l_quantity"}


def test_q04_no_pinned_fact_broadcast(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import broadcast_hint_count

    df = q04_tpch_q3(spark, SF_ORACLE)
    # NO explicit broadcast hints: orders/customer are SF-linear, a pinned
    # hint cannot be demoted by AQE and would OOM at 100 TB. At this tiny
    # SF, AQE still picks BHJ on its own — assert both.
    assert broadcast_hint_count(df) == 0
    assert has_broadcast_join(df)
    # date filters pushed into the scans
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_q06_broadcast_and_codegen(spark):
    df = q06_broadcast_join(spark, SF_ORACLE)
    assert has_broadcast_join(df)
    assert wholestage_codegen_spans(df) >= 1


def test_q22_no_cartesian_no_range_nested_loop(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.windows import q22_interval_join

    plan = explain_str(q22_interval_join(spark, SF_ORACLE))
    # the bucketized interval join must stay an equi-join — a nested-loop
    # formulation would be quadratic per user at scale
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q23_q30_broadcast_bounded_dims_only(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import broadcast_hint_count
    from flink_tornadovm_artifact_spark.queries.relational import (
        q23_tpch_q10,
        q30_tpch_q5,
    )

    q23 = q23_tpch_q10(spark, SF_ORACLE)
    q30 = q30_tpch_q5(spark, SF_ORACLE)
    # explicit hints only on bounded dims: nation (q23); nation+region
    # (q30). customer is SF-linear and must stay unhinted so AQE decides.
    assert broadcast_hint_count(q23) == 1
    assert broadcast_hint_count(q30) == 2
    assert has_broadcast_join(q23)
    assert has_broadcast_join(q30)


def test_q31_partial_aggregation_before_join(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.relational import q31_tpch_q18

    plan = explain_str(q31_tpch_q18(spark, SF_ORACLE))
    # grouped-sum side aggregates before the join (two HashAggregate
    # phases), and the HAVING filter applies to the aggregate, pre-join
    assert plan.count("HashAggregate") >= 2


def test_minhash_single_signature_scan(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.llm import dedup_minhash_lsh

    # simple mode: one "FileScan" marker per scan (formatted mode prints
    # each scan twice — tree row + detail block)
    plan = explain_str(dedup_minhash_lsh(spark, SF_ORACLE), "simple")
    # bucket-array pair generation reads documents ONCE (the old
    # self-join formulation scanned and hashed it twice)
    assert plan.count("FileScan") == 1


def test_q37_semi_join_not_expanded(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.tpch import q37_tpch_q4

    plan = explain_str(q37_tpch_q4(spark, SF_ORACLE), "simple")
    # EXISTS must stay a semi join (no row multiplication before the
    # grouped count), and the date filters must reach the orders scan
    assert "LeftSemi" in plan
    df = q37_tpch_q4(spark, SF_ORACLE)
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_q38_all_predicates_pushed(spark):
    from flink_tornadovm_artifact_spark.queries.tpch import q38_tpch_q6

    df = q38_tpch_q6(spark, SF_ORACLE)
    filters = pushed_filters(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert any(col in f for f in filters), (col, filters)
    cols = read_schema_columns(df)
    # scan reads only the 4 referenced columns of lineitem's 11
    assert cols and set(cols[0]) == {
        "l_shipdate",
        "l_discount",
        "l_quantity",
        "l_extendedprice",
    }


def test_q41_anti_and_dim_joins_broadcast(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import (
        broadcast_hint_count,
        explain_str,
    )
    from flink_tornadovm_artifact_spark.queries.tpch import q41_tpch_q16

    df = q41_tpch_q16(spark, SF_ORACLE)
    plan = explain_str(df, "simple")
    # NOT-IN side must be a broadcast anti join — a shuffled anti join
    # against a tiny supplier exclusion list wastes a full fact shuffle.
    # That filtered-tiny side is the ONLY explicit hint: part is SF-linear
    # (SF*200k rows) and must stay unhinted so AQE picks the strategy.
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert broadcast_hint_count(df) == 1


def test_q42_decorrelates_without_driver_roundtrip(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.tpch import q42_tpch_q17

    plan = explain_str(q42_tpch_q17(spark, SF_ORACLE), "simple")
    # per-part threshold joins back on l_partkey as an equi-join;
    # no cartesian / nested-loop fallback
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_extras_hint_only_bounded_dims(spark):
    """Scale discipline (SCALE.md §Joins): explicit broadcast hints only
    on bounded dims (nation 25 / region 5 rows) or filtered-tiny sides;
    SF-linear part/customer/supplier stay unhinted — AQE promotes them at
    small SF and demotes at 100 TB, which a pinned hint cannot do."""
    from flink_tornadovm_artifact_spark.plans.inspect import (
        broadcast_hint_count,
    )
    from flink_tornadovm_artifact_spark.queries.relational import (
        q24_promo_revenue,
    )
    from flink_tornadovm_artifact_spark.queries.tpch import (
        q42_tpch_q17,
        q43_tpch_q19,
        q45_tpch_q7,
        q46_tpch_q8,
        q51_tpch_q9,
    )

    q45 = q45_tpch_q7(spark, SF_ORACLE)
    # q45: exactly the two nation aliases hinted; at sf0.01 AQE still
    # produces broadcast joins for them
    assert broadcast_hint_count(q45) == 2
    assert has_broadcast_join(q45)
    # q46: nation x2 + region = 3 bounded-dim hints
    assert broadcast_hint_count(q46_tpch_q8(spark, SF_ORACLE)) == 3
    # q51: nation only
    assert broadcast_hint_count(q51_tpch_q9(spark, SF_ORACLE)) == 1
    # q24/q42/q43 join only SF-linear part: zero explicit hints
    assert broadcast_hint_count(q24_promo_revenue(spark, SF_ORACLE)) == 0
    assert broadcast_hint_count(q42_tpch_q17(spark, SF_ORACLE)) == 0
    assert broadcast_hint_count(q43_tpch_q19(spark, SF_ORACLE)) == 0


def test_q40_two_level_agg_reduces_before_second_shuffle(spark):
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.tpch import q40_tpch_q13

    plan = explain_str(q40_tpch_q13(spark, SF_ORACLE), "simple")
    # both aggregation levels plan partial+final HashAggregate pairs
    assert plan.count("HashAggregate") >= 4


def test_orc_json_format_roundtrip(spark, tmp_path):
    """§2.A formats row (FT/flink-formats/: csv json avro parquet orc …):
    orc and json are native Spark read/write; values survive a round
    trip. (Avro needs the external spark-avro package — not in this
    container; documented in sources/io.py.)"""
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, None, 0.0)],
        "id long, s string, v double",
    )
    for fmt in ("orc", "json"):
        path = str(tmp_path / f"rt_{fmt}")
        src.write.format(fmt).mode("overwrite").save(path)
        back = spark.read.format(fmt).load(path)
        if fmt == "json":  # json infers types; align to the source schema
            back = back.select(
                back.id.cast("long"), back.s, back.v.cast("double")
            )
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, src.collect())
        ), fmt


def test_accumulator_in_kernel(spark):
    """RichFunction accumulator surface (SURVEY §2.K: RuntimeContext
    accumulators → Spark accumulators): a pandas kernel counts processed
    rows into an accumulator while transforming."""
    import pandas as pd

    acc = spark.sparkContext.accumulator(0)

    def counted(pdfs):
        for pdf in pdfs:
            acc.add(len(pdf))
            yield pd.DataFrame({"double_id": pdf["id"] * 2})

    n = 1000
    out = spark.range(n, numPartitions=4).mapInPandas(counted, "double_id long")
    assert out.count() == n
    assert acc.value == n


def test_join_strategy_hints_honored(spark):
    """JoinHint strategies (JoinOperatorBase.java:44-78:
    BROADCAST_HASH_*, REPARTITION_HASH_*, REPARTITION_SORT_MERGE) map to
    Spark join hints; the planner must honor each."""
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.tables import load

    orders = load(spark, SF_ORACLE, "orders")
    li = load(spark, SF_ORACLE, "lineitem")

    merge = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    assert "SortMergeJoin" in explain_str(merge, "simple")

    shuffle_hash = li.join(
        orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
    )
    assert "ShuffledHashJoin" in explain_str(shuffle_hash, "simple")

    bcast = li.join(
        orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey
    )
    assert "BroadcastHashJoin" in explain_str(bcast, "simple")


def test_custom_python_datasource_sequence(spark):
    """readFile/createInput extension point (ExecutionEnvironment.java:562,
    :599): a custom Python DataSource with its own split planning."""
    from flink_tornadovm_artifact_spark.sources import read_sequence

    df = read_sequence(spark, 10, 110, num_partitions=5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100
    got = df.agg(F.sum("id")).collect()[0][0]
    assert got == sum(range(10, 110))
    # weyl values deterministic and in [0,1)
    row = df.filter(F.col("id") == 10).collect()[0]
    import math

    phi = (math.sqrt(5.0) - 1.0) / 2.0
    assert abs(row.weyl - (10 * phi - math.floor(10 * phi))) < 1e-12


def test_missing_connector_packages_fail_clearly(spark, tmp_path):
    """Kafka/Avro connectors are format-registry lookups; without their
    packages the failure must be Spark's own actionable error (naming the
    missing source), not a crash deeper in the stack. Pins the documented
    scope line in sources/io.py."""
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException) as ei:
        spark.read.format("avro").load(str(tmp_path / "x.avro"))
    assert "avro" in str(ei.value).lower()

    with _pytest.raises(AnalysisException) as ei:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:9092")
            .option("subscribe", "t")
            .load()
        )
    assert "kafka" in str(ei.value).lower()


def test_dedup_lsh_verified_no_cartesian(spark):
    """The composed LSH→verify pipeline must stay equi-join shaped: the
    candidate pairs join back to the shingle table on doc_id — never a
    cross join (the all-pairs demos are exactly what it replaces)."""
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.llm import dedup_lsh_verified

    plan = explain_str(dedup_lsh_verified(spark, SF_ORACLE), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_temporal_join_single_scan_plan(spark):
    """The as-of join must stay the tagged-union analytic scan: exactly
    two hash exchanges (the (key, time) version-dedup window + the main
    per-key scan) and no nested-loop/cartesian fallback — a correlated
    per-row lookup or range join would explode at scale."""
    import re

    from flink_tornadovm_artifact_spark.queries.temporal_q import (
        temporal_join_events,
    )

    from .conftest import SF_SMOKE

    df = temporal_join_events(spark, SF_SMOKE)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", phys)) == 2
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_triangle_enumeration_no_cartesian(spark):
    """Degree-oriented triad building must plan as equi-joins (the
    orientation predicate rides as a join filter) — never a cartesian
    or nested-loop product."""
    from flink_tornadovm_artifact_spark.queries.gelly import triangle_enum

    from .conftest import SF_SMOKE

    df = triangle_enum(spark, SF_SMOKE)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_cep_followed_by_any_no_cartesian(spark):
    """followedByAny must stay the bucketed equi-join (user, cell) — a
    range-only formulation degenerates to a per-user nested loop."""
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.cep import (
        cep_followed_by_any,
    )

    plan = explain_str(cep_followed_by_any(spark, SF_ORACLE), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bipartite_projection_canonical_filters_before_agg(spark):
    """The supplier projection must filter src < dst BELOW the pair
    aggregation (half the shuffled volume) and stay equi-join shaped."""
    from flink_tornadovm_artifact_spark.plans.inspect import explain_str
    from flink_tornadovm_artifact_spark.queries.gelly import (
        bipartite_projection_suppliers,
    )

    import re

    df = bipartite_projection_suppliers(spark, SF_ORACLE)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the optimized plan prints top-down, so the pair Aggregate must
    # appear BEFORE (above) the src<dst canonicalization predicate —
    # i.e. the filter runs below the aggregation, not after it
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    m = re.search(r"src#\d+L? < dst#\d+L?", opt)
    assert m, opt
    assert opt.index("Aggregate") < m.start()


def test_bigram_lm_no_broadcast_hint(spark):
    """The LM-model joins must carry NO explicit broadcast hint — at
    web scale the model tables are corpus-sized aggregates; AQE decides
    (the SF-linear-hint discipline from the round-2 verdict)."""
    from flink_tornadovm_artifact_spark.plans.inspect import (
        broadcast_hint_count,
    )
    from flink_tornadovm_artifact_spark.queries.llm import (
        text_bigram_lm_score,
    )

    assert broadcast_hint_count(text_bigram_lm_score(spark, SF_ORACLE)) == 0
