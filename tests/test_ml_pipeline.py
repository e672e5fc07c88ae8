"""Flink ML API facade (flink-ml-api core): reference PipelineTest.java
behaviors plus end-to-end equivalence with the direct kernels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tornadovm_artifact_spark.functions.ml_pipeline import (
    Estimator,
    KMeansEstimator,
    KMeansModel,
    LogRegEstimator,
    Pipeline,
    SqlExprTransformer,
)


def test_fit_replaces_estimators_and_applies_reference_loop(spark):
    """Pipeline.java:169-190: stages up to the last estimator are fit/
    applied in order; the fitted pipeline has models in the estimators'
    places and transform() reproduces the running input."""
    pts = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 1.0), (10.0, 10.0), (11.0, 11.0)], "x double, y double"
    )
    p = Pipeline(
        [
            SqlExprTransformer("px", "x"),
            SqlExprTransformer("py", "y"),
            KMeansEstimator([(0, 0.0, 0.0), (1, 10.0, 10.0)], iterations=3),
        ]
    )
    assert p.need_fit()
    with pytest.raises(RuntimeError, match="need to fit"):
        p.transform(pts)
    fitted = p.fit(pts)
    assert not fitted.need_fit()
    assert isinstance(fitted.stages[2], KMeansModel)
    got = {
        (r.x, r.cid) for r in fitted.transform(pts).select("x", "cid").collect()
    }
    assert got == {(0.0, 0), (1.0, 0), (10.0, 1), (11.0, 1)}


def test_stages_after_last_estimator_not_applied_during_fit(spark):
    """The reference's exact loop: a transformer AFTER the last
    estimator is carried over but NOT applied while fitting (its effect
    appears only in transform())."""
    pts = spark.createDataFrame([(1.0, 2.0)], "px double, py double")
    tail = SqlExprTransformer("tagged", "cid + 100")
    p = Pipeline(
        [KMeansEstimator([(0, 0.0, 0.0), (1, 9.0, 9.0)], iterations=1), tail]
    )
    fitted = p.fit(pts)
    assert fitted.stages[1] is tail
    row = fitted.transform(pts).collect()[0]
    assert row.tagged == row.cid + 100


def test_json_round_trip(spark):
    p = Pipeline(
        [
            SqlExprTransformer("px", "x * 2"),
            KMeansEstimator([(0, 0.0, 0.0), (1, 5.0, 5.0)], iterations=2),
        ]
    )
    restored = Pipeline.from_json(p.to_json())
    assert [type(s) for s in restored.stages] == [
        SqlExprTransformer,
        KMeansEstimator,
    ]
    assert restored.stages[1].get_params()["iterations"] == 2
    # a FITTED pipeline round-trips too (models carry their state)
    pts = spark.createDataFrame([(0.0,)], "x double").withColumn(
        "y", F.lit(0.0)
    )
    fitted = Pipeline(
        [SqlExprTransformer("px", "x"), SqlExprTransformer("py", "y")]
    ).fit(pts)
    again = Pipeline.from_json(fitted.to_json())
    assert again.transform(pts).columns == fitted.transform(pts).columns


def test_nested_pipeline_and_validation(spark):
    inner = Pipeline([KMeansEstimator([(0, 0.0, 0.0), (1, 9.0, 9.0)], iterations=1)])
    outer = Pipeline([inner])
    assert outer.need_fit()  # nested pipeline reports its estimators
    with pytest.raises(TypeError, match="Estimator or Transformer"):
        Pipeline([object()])


def test_nested_pipeline_json_round_trip(spark):
    """Pipeline.java recurses into nested pipelines via each stage's own
    toJson(); a get_params()-only serializer silently loses the inner
    stage list (ADVICE r4)."""
    inner = Pipeline(
        [
            SqlExprTransformer("px", "x * 2"),
            KMeansEstimator([(0, 0.0, 0.0), (1, 9.0, 9.0)], iterations=3),
        ]
    )
    outer = Pipeline([SqlExprTransformer("y", "x + 1"), inner])
    restored = Pipeline.from_json(outer.to_json())
    assert [type(s) for s in restored.stages] == [SqlExprTransformer, Pipeline]
    inner_back = restored.stages[1]
    assert [type(s) for s in inner_back.stages] == [
        SqlExprTransformer,
        KMeansEstimator,
    ]
    assert inner_back.stages[1].get_params()["iterations"] == 3
    assert restored.need_fit()


def test_logreg_stage_matches_direct_kernel(spark):
    """LogRegEstimator through the pipeline == functions.logreg
    train+predict directly."""
    import numpy as np

    from flink_tornadovm_artifact_spark.functions.logreg import (
        predict,
        train,
    )

    rows = [([0.0, 1.0], 0.0), ([1.0, 0.0], 1.0), ([0.9, 0.1], 1.0),
            ([0.1, 0.9], 0.0)]
    df = spark.createDataFrame(rows, "features array<double>, label double")
    fitted = Pipeline([LogRegEstimator(dim=2, iterations=5)]).fit(df)
    via_pipeline = sorted(
        r.pred for r in fitted.transform(df).collect()
    )
    w = train(df, dim=2, iterations=5)
    direct = sorted(r.pred for r in predict(df, np.asarray(w)).collect())
    assert via_pipeline == direct


def test_estimator_base_is_abstract(spark):
    with pytest.raises(NotImplementedError):
        Estimator().fit(spark.range(1))


# ---------------------------------------------------------------------------
# Self-reporting parity sweep over flink-ml-api's core package, same
# discipline as tests/test_gelly_parity.py / test_cep_parity.py.
# ---------------------------------------------------------------------------
_ML_API = (
    "/root/reference/Flink-TornadoVM/flink-ml-parent/flink-ml-api/"
    "src/main/java/org/apache/flink/ml/api"
)

ML_IMPLEMENTED = {
    "core/Pipeline.java": "Pipeline",
    "core/PipelineStage.java": "PipelineStage",
    "core/Estimator.java": "Estimator",
    "core/Transformer.java": "Transformer",
    "core/Model.java": "Model",
}

ML_NOT_ALGORITHMS = {
    # typed-parameter registry scaffolding: a Python kwargs dict with
    # explicit keys carries the same information (module docstring)
    "misc/param/Params.java",
    "misc/param/ParamInfo.java",
    "misc/param/ParamInfoFactory.java",
    "misc/param/ParamValidator.java",
    "misc/param/WithParams.java",
}


def test_ml_api_files_accounted_for():
    import os

    if not os.path.isdir(_ML_API):
        pytest.skip("reference tree not mounted")
    files = set()
    for root, _d, fs in os.walk(_ML_API):
        for f in fs:
            if f.endswith(".java"):
                files.add(
                    os.path.relpath(os.path.join(root, f), _ML_API)
                )
    accounted = set(ML_IMPLEMENTED) | ML_NOT_ALGORITHMS
    missing = sorted(files - accounted)
    stale = sorted(accounted - files)
    assert not missing, f"unmapped flink-ml-api files: {missing}"
    assert not stale, f"mappings to nonexistent files: {stale}"


def test_ml_api_mappings_resolve():
    import flink_tornadovm_artifact_spark.functions.ml_pipeline as mp

    for ref, name in ML_IMPLEMENTED.items():
        assert getattr(mp, name, None) is not None, f"{ref} -> {name}"
