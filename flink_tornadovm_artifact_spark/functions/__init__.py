"""Numeric kernels + iterative pipelines (the accelerated tier).

The reference accelerates data-parallel map/reduce kernels over flat
buffers via TornadoVM (SURVEY.md §2.I, §6). The Spark-native analog:
Arrow-batched pandas/Arrow UDFs with a pluggable array backend — NumPy on
CPU (default, the ``-Dtornado=false`` path), CuPy when a GPU is present
(the ``-Dtornado=true`` path). Query semantics are unchanged either way,
exactly as in the reference.
"""

from .backend import get_backend
from .kernels import dft, pi_estimation, vector_add, matmul_rows

__all__ = ["get_backend", "dft", "pi_estimation", "vector_add", "matmul_rows"]
