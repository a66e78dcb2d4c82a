"""First-class Gaussian-integer RNS element operations.

Mirror of the reference's GaussianIntRNS struct (gpu_math.cuh:11-91): a
Gaussian integer x + iy held as per-limb residue pairs, with add / sub /
mul / conj / mul_by_neg_i.  The reference defines the struct but never
instantiates it (SURVEY 2.4); here the same algebra is exposed as batched
array ops (limb-major [L, ...] pairs, any trailing shape) and is the scalar
core the trace machinery's complex GEMMs build on (models/trace.py).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import modmath as mm


class GaussianIntRNS(NamedTuple):
    """x + iy over the RNS basis; components limb-major [L, ...] uint64."""
    x: jnp.ndarray
    y: jnp.ndarray


def _q(moduli: Sequence[int], ndim: int) -> jnp.ndarray:
    q = np.asarray(moduli, dtype=np.uint64)
    return jnp.asarray(q.reshape((len(q),) + (1,) * (ndim - 1)))


def _consts(moduli: Sequence[int], ndim: int):
    return mm.mont_consts_arrays(tuple(int(m) for m in moduli),
                                 shape_suffix=(1,) * (ndim - 1))


def add(a: GaussianIntRNS, b: GaussianIntRNS, moduli) -> GaussianIntRNS:
    q = _q(moduli, a.x.ndim)
    return GaussianIntRNS(mm.add_mod(a.x, b.x, q), mm.add_mod(a.y, b.y, q))


def sub(a: GaussianIntRNS, b: GaussianIntRNS, moduli) -> GaussianIntRNS:
    q = _q(moduli, a.x.ndim)
    return GaussianIntRNS(mm.sub_mod(a.x, b.x, q), mm.sub_mod(a.y, b.y, q))


def mul(a: GaussianIntRNS, b: GaussianIntRNS, moduli) -> GaussianIntRNS:
    """(a.x + i a.y)(b.x + i b.y), four modular products per limb
    (gpu_math.cuh:52-76)."""
    c = _consts(moduli, a.x.ndim)
    q, qi, r2 = c["q"], c["qinv_neg"], c["r2"]
    ax_m = mm.to_mont(a.x, q, qi, r2)
    ay_m = mm.to_mont(a.y, q, qi, r2)
    xx = mm.mont_mul(ax_m, b.x, q, qi)
    yy = mm.mont_mul(ay_m, b.y, q, qi)
    xy = mm.mont_mul(ax_m, b.y, q, qi)
    yx = mm.mont_mul(ay_m, b.x, q, qi)
    return GaussianIntRNS(mm.sub_mod(xx, yy, q), mm.add_mod(xy, yx, q))


def conj(a: GaussianIntRNS, moduli) -> GaussianIntRNS:
    """x - iy (gpu_math.cuh:78-82)."""
    q = _q(moduli, a.x.ndim)
    return GaussianIntRNS(a.x, mm.neg_mod(a.y, q))


def mul_by_neg_i(a: GaussianIntRNS, moduli) -> GaussianIntRNS:
    """-i (x + iy) = y - ix (gpu_math.cuh:84-90), the B'-map twist scalar."""
    q = _q(moduli, a.x.ndim)
    return GaussianIntRNS(a.y, mm.neg_mod(a.x, q))


def to_complex(a: GaussianIntRNS, moduli) -> Tuple[np.ndarray, np.ndarray]:
    """Centered lift of both components to float (test convenience)."""
    from .crt import CRTComposer
    comp = CRTComposer(tuple(int(m) for m in moduli))
    return (np.asarray(comp.compose_to_float(a.x, 1.0)),
            np.asarray(comp.compose_to_float(a.y, 1.0)))
