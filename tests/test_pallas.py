"""Pallas fused-stage NTT vs the XLA-composed reference path.

On CPU these run through the Pallas interpreter (bit-exact semantics); the
Mosaic-compiled TPU path is exercised by bench.py and was validated
bit-exact on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_fhe_tpu.ops.ntt_large import (FourStepNTT, FourStepPlan,
                                          generate_primes_1mod)
from matrix_fhe_tpu.ops import pallas_ntt as pn


@pytest.fixture(scope="module")
def setup():
    primes = generate_primes_1mod(2, 35, 1 << 11)
    plan = FourStepPlan.make(1024, primes)  # n1 = n2 = 32
    return plan, FourStepNTT(plan), pn.PallasFourStepNTT(plan, row_tile=32)


def test_u32_pair_helpers(rng):
    a = rng.integers(0, 1 << 63, size=256, dtype=np.uint64)
    b = rng.integers(0, 1 << 45, size=256, dtype=np.uint64)
    with jax.enable_x64(False):
        ah = jnp.asarray((a >> 32).astype(np.uint32))
        al = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32))
        bh = jnp.asarray((b >> 32).astype(np.uint32))
        bl = jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32))
        p3, p2, p1, p0 = pn._mul64_full(ah, al, bh, bl)
        got = (np.asarray(p3).astype(object) << 96) | \
              (np.asarray(p2).astype(object) << 64) | \
              (np.asarray(p1).astype(object) << 32) | \
              np.asarray(p0).astype(object)
        want = a.astype(object) * b.astype(object)
        assert (got == want).all()
        lh, ll = pn._mullo64(ah, al, bh, bl)
        lo64 = (np.asarray(lh).astype(object) << 32) | np.asarray(ll)
        assert (lo64 == (want & ((1 << 64) - 1))).all()


def test_mont_pair_matches_bigint(rng):
    from matrix_fhe_tpu.ops.modmath import MontConsts
    q = 17192831233
    mc = MontConsts.make(q)
    a = rng.integers(0, q, size=512, dtype=np.uint64)
    b = rng.integers(0, q, size=512, dtype=np.uint64)
    with jax.enable_x64(False):
        rh, rl = pn._mont_mul_pair(
            jnp.asarray((a >> 32).astype(np.uint32)),
            jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((b >> 32).astype(np.uint32)),
            jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32)),
            jnp.uint32(q >> 32), jnp.uint32(q & 0xFFFFFFFF),
            jnp.uint32(mc.qinv_neg >> 32),
            jnp.uint32(mc.qinv_neg & 0xFFFFFFFF))
    got = (np.asarray(rh).astype(object) << 32) | np.asarray(rl)
    rinv = pow(1 << 64, -1, q)
    want = a.astype(object) * b.astype(object) * rinv % q
    assert (got == want).all()


def test_pallas_forward_bit_exact(setup, rng):
    plan, ref, pal = setup
    x = np.stack([rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xr = np.asarray(ref.forward(jnp.asarray(x)))
    xp = np.asarray(pal.forward(jnp.asarray(x)))
    assert (xr == xp).all()


def test_pallas_roundtrip_exact(setup, rng):
    plan, ref, pal = setup
    x = np.stack([rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    back = np.asarray(pal.inverse(pal.forward(jnp.asarray(x))))
    assert (back == x).all()


def test_split_join_u64(rng):
    x = jnp.asarray(rng.integers(0, 1 << 64, size=64, dtype=np.uint64))
    lo, hi = pn.split_u64(x)
    assert (np.asarray(pn.join_u64(lo, hi)) == np.asarray(x)).all()
