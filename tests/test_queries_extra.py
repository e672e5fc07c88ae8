"""Quality tests for the ANN scale paths: the approximate variants must
actually recall the brute-force neighbors on the testdata (deterministic,
so thresholds are stable pins, not flaky bounds)."""

from __future__ import annotations

from flink_tornadovm_artifact_spark.queries.llm import (
    similarity_ivf,
    similarity_topk,
)

from .conftest import SF_SMOKE


def _top5(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark):
    truth = _top5(similarity_topk(spark, SF_SMOKE))
    approx = _top5(similarity_ivf(spark, SF_SMOKE))
    assert set(approx) == set(truth)
    recalls = [len(approx[q] & truth[q]) / 5 for q in truth]
    # measured 0.8-1.0 on the deterministic testdata; 0.6 guards regressions
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_approx_aggregates_error_bound(spark):
    """q49's sketches must track the exact answers: HLL++ at rsd=0.02 and
    percentile_approx at accuracy=10000 should land within 5% on the
    deterministic testdata."""
    from pyspark.sql import functions as F

    from flink_tornadovm_artifact_spark.queries.relational import (
        q49_approx_aggregates,
    )
    from flink_tornadovm_artifact_spark.tables import load

    approx = {
        r["l_returnflag"]: r for r in q49_approx_aggregates(spark, SF_SMOKE).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k]["apx_nd_parts"] - exact[k]["nd"]) <= 0.05 * exact[k]["nd"]
        assert abs(approx[k]["apx_p50"] - exact[k]["p50"]) <= 0.05 * exact[k]["p50"]
