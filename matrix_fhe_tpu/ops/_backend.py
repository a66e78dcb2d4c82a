"""Backend-path selection shared by every kernelized op.

The TPU (Mosaic) kernel path normally switches on ``jax.default_backend()``;
``MFHE_FORCE_TPU_PATH=1`` forces it from a CPU-only host so the full
TPU-shaped program can be cross-platform lowered (``jax.export`` with
``platforms=("tpu",)``) for compile-budget analysis without a chip
(docs/PERF.md "Compile-budget census").
"""

from __future__ import annotations

import os


def force_tpu_path() -> bool:
    return os.environ.get("MFHE_FORCE_TPU_PATH", "0") == "1"


def tpu_kernels_default() -> bool:
    """Default for a ``use_pallas=None`` constructor argument."""
    import jax

    return force_tpu_path() or jax.default_backend() == "tpu"


def pallas_interpret_default() -> bool:
    """Whether a pallas_call should run in interpreter mode (CPU tests)."""
    import jax

    return (not force_tpu_path()) and jax.default_backend() == "cpu"
