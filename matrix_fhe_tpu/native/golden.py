"""ctypes loader for the native golden-model oracle (golden.cpp).

Same build/caching pattern as tablegen.py; `available()` gates use so tests
skip gracefully when no C++ toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "golden.cpp")
_SO = os.path.join(_HERE, "libgolden.so")
_lock = threading.Lock()
_lib = None
_tried = False

_U64P = ctypes.POINTER(ctypes.c_uint64)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.mf_polymul_wrap.argtypes = [
                ctypes.c_uint64, ctypes.c_uint64, ctypes.c_longlong,
                _U64P, _U64P, _U64P]
            lib.mf_mod_matvec.argtypes = [
                ctypes.c_uint64, ctypes.c_longlong, ctypes.c_longlong,
                _U64P, _U64P, _U64P]
            lib.mf_uniform_a.argtypes = [
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
                _U64P, _U64P]
            lib.mf_ternary_secret.argtypes = [
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
                _U64P, _U64P]
            lib.mf_gaussian_noise.argtypes = [
                ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_double, _U64P, _U64P]
            lib.mf_crt_compose_centered.argtypes = [
                ctypes.c_longlong, _U64P, _U64P, _U64P, _U64P, _U64P, _U64P,
                ctypes.c_longlong, _U64P,
                ctypes.POINTER(ctypes.c_longlong)]
            lib.mf_ntt_polymul.argtypes = [
                ctypes.c_uint64, ctypes.c_longlong,
                _U64P, _U64P, _U64P, _U64P, _U64P]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _p(a: np.ndarray):
    return a.ctypes.data_as(_U64P)


def polymul_wrap(q: int, wrap: int, a: np.ndarray, b: np.ndarray
                 ) -> np.ndarray:
    lib = _load()
    n = a.size
    out = np.zeros(n, dtype=np.uint64)
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    lib.mf_polymul_wrap(q, wrap, n, _p(a), _p(b), _p(out))
    return out


def mod_matvec(q: int, table: np.ndarray, x: np.ndarray) -> np.ndarray:
    lib = _load()
    rows, cols = table.shape
    out = np.zeros(rows, dtype=np.uint64)
    table = np.ascontiguousarray(table, dtype=np.uint64)
    x = np.ascontiguousarray(x, dtype=np.uint64)
    lib.mf_mod_matvec(q, rows, cols, _p(table), _p(x), _p(out))
    return out


def uniform_a(L: int, W: int, n: int, moduli) -> np.ndarray:
    lib = _load()
    q = np.ascontiguousarray(moduli, dtype=np.uint64)
    out = np.zeros((L, W, n, n), dtype=np.uint64)
    lib.mf_uniform_a(L, W, n, _p(q), _p(out))
    return out


def ternary_secret(L: int, W: int, n: int, moduli) -> np.ndarray:
    lib = _load()
    q = np.ascontiguousarray(moduli, dtype=np.uint64)
    out = np.zeros((L, W, n), dtype=np.uint64)
    lib.mf_ternary_secret(L, W, n, _p(q), _p(out))
    return out


def gaussian_noise(L: int, W: int, n: int, sigma: float, moduli) -> np.ndarray:
    lib = _load()
    q = np.ascontiguousarray(moduli, dtype=np.uint64)
    out = np.zeros((L, W, n, n), dtype=np.uint64)
    lib.mf_gaussian_noise(L, W, n, float(sigma), _p(q), _p(out))
    return out


def crt_compose_centered(residues: np.ndarray, m_tables: np.ndarray,
                         inv_tables: np.ndarray, moduli: np.ndarray,
                         q_big: np.ndarray, q_half: np.ndarray):
    """One coefficient: returns (magnitude words LE, negative?)."""
    lib = _load()
    L = residues.size
    words = q_big.size
    mag = np.zeros(words, dtype=np.uint64)
    neg = ctypes.c_longlong(0)
    lib.mf_crt_compose_centered(
        L, _p(np.ascontiguousarray(residues, np.uint64)),
        _p(np.ascontiguousarray(m_tables, np.uint64)),
        _p(np.ascontiguousarray(inv_tables, np.uint64)),
        _p(np.ascontiguousarray(moduli, np.uint64)),
        _p(np.ascontiguousarray(q_big, np.uint64)),
        _p(np.ascontiguousarray(q_half, np.uint64)),
        words, _p(mag), ctypes.byref(neg))
    return mag, bool(neg.value)


def ntt_polymul(q: int, fwd: np.ndarray, inv: np.ndarray,
                a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    n = a.size
    out = np.zeros(n, dtype=np.uint64)
    lib.mf_ntt_polymul(
        q, n, _p(np.ascontiguousarray(fwd, np.uint64)),
        _p(np.ascontiguousarray(inv, np.uint64)),
        _p(np.ascontiguousarray(a, np.uint64)),
        _p(np.ascontiguousarray(b, np.uint64)), _p(out))
    return out
