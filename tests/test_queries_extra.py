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
