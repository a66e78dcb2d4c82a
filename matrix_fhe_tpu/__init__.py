"""matrix_fhe_tpu — TPU-native Matrix-FHE (GL/CKKS-variant) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Shaibk/Matrix-FHE-GPU reference (CUDA/C++): packing phi(p)=512 complex 64x64
matrices into one RLWE ciphertext over Z_Q[X,W] (X: negacyclic degree-64
polynomial axis; W: prime-cyclotomic Phi_p(W) axis evaluated by a dense CRT
transform), with an 11-limb RNS modulus chain.

Design stance (TPU-first, not a CUDA translation):
  * Residues are uint64 JAX arrays (XLA emulates 64-bit integers exactly on
    TPU); hot element-wise modular arithmetic uses Montgomery multiplication
    built from 32-bit-split high products (ops/modmath.py).
  * The dense W-CRT transform, the X-axis NTT and the homomorphic trace GEMM
    are *exact* modular matrix multiplications executed on the MXU via 7-bit
    chunk decomposition into int8 dot_generals with int32 accumulation
    (ops/modmatmul.py) — the reference's per-element O(phi) loops
    (HE.cu:716-781) become systolic-array matmuls.
  * The complex sigma-embedding encode/decode path runs in float64 (XLA
    emulates f64 on TPU with full 53-bit-mantissa fidelity).
  * Host-side one-time table generation (eta/psi root search, 512x512
    Gauss-Jordan inverse mod q, CRT big-int tables) is native C++
    (native/tablegen.cpp) loaded via ctypes, with a pure-Python fallback.
  * Multi-chip scaling is expressed with jax.sharding.Mesh + NamedSharding
    (parallel/): RNS-limb / W-lane / ciphertext-batch axes, and a
    coefficient-sharded four-step NTT using shard_map + all_to_all.

This package requires jax_enable_x64; importing it turns the flag on.
"""

import os as _os

import jax as _jax

# 64-bit integers (and f64) are load-bearing for exact RNS arithmetic.
# This must happen before any tracing; importing the package opts in.
_jax.config.update("jax_enable_x64", True)

# Mosaic kernel payloads embed full Python tracebacks as MLIR locations by
# default, so two instances of the SAME kernel constructed at different call
# sites serialize to different bytes — every transform instance then misses
# the XLA/Mosaic compile caches (measured: the ref roundtrip and keyswitch
# pipelines shared ZERO payloads, docs/PERF.md round 3).  Collapsing
# locations to the top frame makes structurally-identical kernels
# byte-identical: one Mosaic compile each, shared across programs, presets
# and re-runs.  Opt back into full tracebacks (for kernel debugging) with
# MFHE_FULL_TRACEBACK_LOCS=1.
if _os.environ.get("MFHE_FULL_TRACEBACK_LOCS", "0") != "1":
    try:  # flag name may move between JAX versions
        _jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # pragma: no cover - version drift
        pass

# Persistent XLA compilation cache: the chunked-matmul pipelines are large
# graphs; caching makes repeated processes (bench, drivers, tests) skip the
# one-time compile.  Opt out with MATRIX_FHE_NO_XLA_CACHE=1.
if not _os.environ.get("MATRIX_FHE_NO_XLA_CACHE"):
    _cache = _os.environ.get(
        "MATRIX_FHE_XLA_CACHE",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      "..", ".cache", "xla"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # read-only installs: run without the cache
        pass

from .config import GLParams, get_params, REF_PARAMS_NAME  # noqa: E402,F401

__version__ = "0.1.0"

_LAZY = {
    "Ciphertext": ".models.he",
    "SecretKey": ".models.he",
    "HEContext": ".models.he",
    "init_he_backend": ".models.he",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(name)
