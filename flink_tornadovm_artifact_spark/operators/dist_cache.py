"""Distributed file cache — the reference's
``ExecutionEnvironment.registerCachedFile`` +
``RuntimeContext.getDistributedCache().getFile(name)`` pair
(``FT/flink-core/.../cache/DistributedCache.java``): ship a small side
file (dictionary, model, stopword list) to every worker once and open
it locally inside user functions.

Spark analog is exact: ``SparkContext.addFile`` distributes the file to
every executor's work directory; ``SparkFiles.get`` resolves the local
path inside any UDF/mapInPandas body. The file moves over the cluster
ONCE per executor (torrent-style broadcast), not per task — the same
contract as Flink's cache. For structured lookup data prefer a
broadcast variable or broadcast join; the file cache is for artifacts a
library wants as an actual FILE on disk (tokenizer vocab, ONNX model).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def register_cached_file(spark: SparkSession, path: str) -> str:
    """Ship ``path`` to every executor (registerCachedFile analog).
    Returns the name to pass to :func:`cached_file_path`."""
    spark.sparkContext.addFile(path)
    return os.path.basename(path)


def cached_file_path(name: str) -> str:
    """Executor-local path of a cached file — call INSIDE a UDF /
    mapInPandas body (getDistributedCache().getFile analog)."""
    from pyspark import SparkFiles

    return SparkFiles.get(name)
