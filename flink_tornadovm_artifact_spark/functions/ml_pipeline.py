"""Flink ML API facade (``flink-ml-parent/flink-ml-api/.../api/core/``:
Pipeline.java, Estimator.java, Transformer.java, Model.java,
PipelineStage.java; params from ``api/misc/param/Params.java``): the
Estimator/Transformer pipeline abstraction — itself modeled on Spark
ML's — re-expressed over DataFrames and wired to this repo's training
kernels.

Reference semantics implemented 1:1:

- ``Pipeline.fit`` (Pipeline.java:169-190): walk stages up to the LAST
  estimator; estimators fit on the running input and are replaced by
  their models, transformers pass through; every stage ≤ the last
  estimator transforms the running input for the next stage. Stages
  AFTER the last estimator are carried over untrained and NOT applied
  during fit — the reference's exact (and slightly surprising) loop.
- ``Pipeline.transform`` (Pipeline.java:201-209): applies every stage;
  raises if any estimator remains unfitted (``needFit``).
- ``appendStage`` accepts estimators, transformers, and nested
  pipelines (a Pipeline is both, Pipeline.java:60).
- ``to_json`` / ``from_json`` (Pipeline.java:212-238): stage class
  path + params, restored via import — the persistence contract.

The params object is a plain dict snapshot; the reference's typed
ParamInfo/validator registry is Java type-system scaffolding (a Python
kwargs dict with explicit keys carries the same information).
"""

from __future__ import annotations

import importlib
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PipelineStage:
    """PipelineStage.java: a named stage with a params snapshot."""

    def __init__(self, **params):
        self.params = dict(params)

    def get_params(self) -> dict:
        return dict(self.params)


class Transformer(PipelineStage):
    """Transformer.java: transform(df) → df."""

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError


class Model(Transformer):
    """Model.java: a Transformer produced by an Estimator."""


class Estimator(PipelineStage):
    """Estimator.java: fit(df) → Model."""

    def fit(self, df: DataFrame) -> Model:
        raise NotImplementedError


class Pipeline(Estimator, Transformer):
    """Pipeline.java: an ordered stage list that is itself both an
    Estimator and a Transformer."""

    def __init__(self, stages: list[PipelineStage] | None = None):
        super().__init__()
        self.stages: list[PipelineStage] = []
        for s in stages or []:
            self.append_stage(s)

    def append_stage(self, stage: PipelineStage) -> "Pipeline":
        if not isinstance(stage, (Estimator, Transformer)):
            raise TypeError(
                "All PipelineStages should be Estimator or Transformer"
            )
        self.stages.append(stage)
        return self

    def _needs_fit(self, stage: PipelineStage) -> bool:
        if isinstance(stage, Pipeline):
            return stage.need_fit()
        return isinstance(stage, Estimator)

    def need_fit(self) -> bool:
        return any(self._needs_fit(s) for s in self.stages)

    def fit(self, df: DataFrame) -> "Pipeline":
        last = max(
            (i for i, s in enumerate(self.stages) if self._needs_fit(s)),
            default=-1,
        )
        fitted: list[PipelineStage] = []
        cur = df
        for i, s in enumerate(self.stages):
            if i <= last:
                t = s.fit(cur) if self._needs_fit(s) else s
                fitted.append(t)
                cur = t.transform(cur)
            else:
                fitted.append(s)
        return Pipeline(fitted)

    def transform(self, df: DataFrame) -> DataFrame:
        if self.need_fit():
            raise RuntimeError(
                "Pipeline contains Estimator, need to fit first."
            )
        for s in self.stages:
            df = s.transform(df)
        return df

    # -- persistence (Pipeline.java toJson/loadJson) -------------------
    def to_json(self) -> str:
        out = []
        for s in self.stages:
            cls = type(s)
            entry = {
                "stageClassName": f"{cls.__module__}.{cls.__qualname__}",
                "params": s.get_params(),
            }
            # A nested Pipeline's stages are NOT in its params; the
            # reference recurses via each stage's own toJson(), so we
            # embed the nested stage list to keep round trips lossless.
            if isinstance(s, Pipeline):
                entry["pipelineJson"] = s.to_json()
            out.append(entry)
        return json.dumps(out)

    @classmethod
    def from_json(cls, payload: str) -> "Pipeline":
        stages = []
        for d in json.loads(payload):
            mod, _, name = d["stageClassName"].rpartition(".")
            stage_cls = getattr(importlib.import_module(mod), name)
            if issubclass(stage_cls, Pipeline):
                stages.append(stage_cls.from_json(d["pipelineJson"]))
            else:
                stages.append(stage_cls(**d["params"]))
        return cls(stages)


# ---------------------------------------------------------------------------
# Concrete stages over the repo's training kernels.
# ---------------------------------------------------------------------------
class SqlExprTransformer(Transformer):
    """A select-expression feature stage (the role flink-ml-lib's
    table-expression operators play): adds ``output_col`` = ``expr``."""

    def __init__(self, output_col: str, expr: str):
        super().__init__(output_col=output_col, expr=expr)

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.params["output_col"], F.expr(self.params["expr"])
        )


class KMeansEstimator(Estimator):
    """Wraps functions.kmeans.kmeans (Lloyd's over (px, py))."""

    def __init__(self, init_centroids, iterations: int = 10):
        super().__init__(
            init_centroids=[list(c) for c in init_centroids],
            iterations=iterations,
        )

    def fit(self, df: DataFrame) -> "KMeansModel":
        from .kmeans import kmeans

        cents = kmeans(
            df,
            [tuple(c) for c in self.params["init_centroids"]],
            iterations=self.params["iterations"],
        )
        return KMeansModel(centroids=[list(c) for c in cents])


class KMeansModel(Model):
    def __init__(self, centroids):
        super().__init__(centroids=[list(c) for c in centroids])

    def transform(self, df: DataFrame) -> DataFrame:
        from .kmeans import _nearest_cid

        return df.withColumn(
            "cid", _nearest_cid([tuple(c) for c in self.params["centroids"]])
        )


class LogRegEstimator(Estimator):
    """Wraps functions.logreg.train (full-batch GD on
    (features array<double>, label double))."""

    def __init__(
        self,
        dim: int,
        iterations: int = 10,
        lr: float = 0.1,
        features_col: str = "features",
        label_col: str = "label",
    ):
        super().__init__(
            dim=dim,
            iterations=iterations,
            lr=lr,
            features_col=features_col,
            label_col=label_col,
        )

    def fit(self, df: DataFrame) -> "LogRegModel":
        from .logreg import train

        w = train(
            df,
            dim=self.params["dim"],
            iterations=self.params["iterations"],
            lr=self.params["lr"],
            features_col=self.params["features_col"],
            label_col=self.params["label_col"],
        )
        return LogRegModel(
            weights=[float(x) for x in w],
            features_col=self.params["features_col"],
        )


class LogRegModel(Model):
    def __init__(self, weights, features_col: str = "features"):
        super().__init__(
            weights=[float(x) for x in weights], features_col=features_col
        )

    def transform(self, df: DataFrame) -> DataFrame:
        import numpy as np

        from .logreg import predict

        return predict(
            df,
            np.asarray(self.params["weights"]),
            features_col=self.params["features_col"],
        )
