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


def test_q19_outliers_fire_on_injected_spike(spark, tmp_path):
    """The round-2 verdict flagged q19 as vacuously green (0 rows from
    both engines). This pins the predicate the hard way: a fixture with a
    flat per-(user, day) series plus one injected spike must return
    exactly the spike row."""
    import datetime as dt

    from flink_tornadovm_artifact_spark.queries.iot import q19_iot_outliers

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1, one day: 20 flat readings around 50 ± 1, one 500 spike
        (i, base + dt.timedelta(minutes=30 * i), 1, "reading",
         50.0 + (i % 3) - 1.0, "{}")
        for i in range(20)
    ]
    rows.append((99, base + dt.timedelta(hours=12), 1, "reading", 500.0, "{}"))
    # user 2: too few points for a stddev (n=1 -> sd NULL, never fires)
    rows.append((200, base, 2, "reading", 9999.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = q19_iot_outliers(spark, str(tmp_path)).collect()
    assert [r["event_id"] for r in got] == [99]
    assert got[0]["value"] == 500.0


def test_q19_discriminating_at_oracle_sf(spark):
    """Guards against the vacuous-green regression: the oracle-checked
    predicate must actually fire on the driver's sf0.01 fixture."""
    from flink_tornadovm_artifact_spark.queries.iot import q19_iot_outliers

    from .conftest import SF_ORACLE

    assert q19_iot_outliers(spark, SF_ORACLE).count() > 0


def test_count_min_sketch_overestimates(spark):
    """The CMS contract: for any token, min over rows of its bucket
    count >= the exact corpus frequency (equality when no collision)."""
    from collections import Counter

    from flink_tornadovm_artifact_spark.queries.llm import (
        CMS_DEPTH,
        CMS_WIDTH,
        sketch_count_min_tokens,
    )
    from flink_tornadovm_artifact_spark.tables import load

    sketch = {
        (r.row_id, r.bucket): r.cnt
        for r in sketch_count_min_tokens(spark, SF_SMOKE).collect()
    }
    docs = load(spark, SF_SMOKE, "documents").select("text").collect()
    exact = Counter(t for r in docs for t in r.text.split(" "))
    import hashlib

    def bucket(tok, i):
        h = hashlib.md5(f"{tok}#cms{i}".encode()).hexdigest()[:8]
        return int(h, 16) % CMS_WIDTH

    sample = list(exact.items())[:20]
    checked = 0
    for tok, n in sample:
        est = min(
            sketch.get((i, bucket(tok, i)), 0) for i in range(CMS_DEPTH)
        )
        assert est >= n, (tok, est, n)
        checked += 1
    assert checked == len(sample) > 0
    # total mass per row equals the token count (sketch conservation)
    total = sum(exact.values())
    for i in range(CMS_DEPTH):
        assert sum(v for (ri, _), v in sketch.items() if ri == i) == total
