"""flink_tornadovm_artifact_spark — a PySpark-native analytics engine.

Rebuilds the query / data-processing capability surface of the
Flink-TornadoVM artifact (mairooni/Flink-TornadoVM-Artifact) on idiomatic
Apache Spark: DataFrame/SQL via Catalyst for the relational core,
Structured Streaming for the stream surface, and Arrow/pandas UDFs for the
accelerated numeric-kernel tier (the analog of the reference's
TornadoVM GPU path, which is orthogonal to query semantics).

Layout:
- ``session``   — SparkSession factory tuned for local[N] and cluster use
- ``tables``    — loaders for the driver testdata (TPC-H-ish star schema)
- ``operators`` — DataSet-style operator facade (map/reduce/join/coGroup/...)
- ``sources``   — read/write helpers mirroring the reference's I/O surface
- ``functions`` — numeric kernels (matmul, DFT, pi, vadd, kmeans, logreg)
- ``plans``     — plan inspection / optimization helpers
- ``streaming`` — Structured Streaming mirrors of the DataStream surface
- ``queries``   — the declared query set (SURVEY.md §2.J) + LLM-pipeline ops
"""

__version__ = "0.1.0"
