"""Pluggable array backend: NumPy (CPU) default, CuPy (GPU) when present.

Mirrors the reference's ``-Dtornado=true/false`` mode switch (README.md
"Configuring Execution Properties"): the same kernel body runs on either
device, and the engine degrades to CPU silently when no GPU exists.
"""

from __future__ import annotations

import os


def get_backend(name: str | None = None):
    """Return the array module. ``name``: 'numpy', 'cupy', or 'auto'
    (env ``SPARK_GRAFT_BACKEND`` overrides; default auto)."""
    name = name or os.environ.get("SPARK_GRAFT_BACKEND", "auto")
    if name in ("auto", "cupy"):
        try:
            import cupy  # noqa: F401 — optional GPU tier

            return cupy
        except ImportError:
            if name == "cupy":
                raise
    import numpy

    return numpy


def to_numpy(arr):
    """Device→host transfer when the backend is CuPy; no-op for NumPy."""
    return arr.get() if hasattr(arr, "get") else arr
