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
    b = rng.integers(0, 1 << 48, size=256, dtype=np.uint64)
    c16 = rng.integers(0, 1 << 16, size=256, dtype=np.uint64)
    with jax.enable_x64(False):
        ah = jnp.asarray((a >> 32).astype(np.uint32))
        al = jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32))
        bh = jnp.asarray((b >> 32).astype(np.uint32))
        bl = jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32))
        want = a.astype(object) * b.astype(object)
        lh, ll = pn._mullo64(ah, al, bh, bl)
        lo64 = (np.asarray(lh).astype(object) << 32) | np.asarray(ll)
        assert (lo64 == (want & ((1 << 64) - 1))).all()
        hi, lo = pn._mul_u32_u16(al, jnp.asarray(c16.astype(np.uint32)))
        got = (np.asarray(hi).astype(object) << 32) | np.asarray(lo)
        assert (got == (a & 0xFFFFFFFF).astype(object) * c16).all()


def test_redc_and_montmul48_match_bigint(rng):
    from matrix_fhe_tpu.ops.modmath import MontConsts
    for q in (17192831233, (1 << 45) - 55, (1 << 35) - 849):
        mc = MontConsts.make(q)
        qh = jnp.uint32(q >> 32)
        ql = jnp.uint32(q & 0xFFFFFFFF)
        qih = jnp.uint32(mc.qinv_neg >> 32)
        qil = jnp.uint32(mc.qinv_neg & 0xFFFFFFFF)
        rinv = pow(1 << 64, -1, q)
        # _redc on 128-bit t < R*q
        t = [int(x) % (q << 64) for x in
             rng.integers(0, 1 << 63, size=64, dtype=np.uint64).astype(object)
             * rng.integers(0, 1 << 45, size=64, dtype=np.uint64).astype(object)]
        with jax.enable_x64(False):
            words = [jnp.asarray(np.array([(v >> (32 * i)) & 0xFFFFFFFF
                                           for v in t], dtype=np.uint32))
                     for i in range(4)]
            rh, rl = pn._redc(words[3], words[2], words[1], words[0],
                              qh, ql, qih, qil)
        got = (np.asarray(rh).astype(object) << 32) | np.asarray(rl)
        want = np.array([v * rinv % q for v in t], dtype=object)
        assert (got == want).all()
        # _montmul48 on canonical residues
        a = rng.integers(0, q, size=256, dtype=np.uint64)
        b = rng.integers(0, q, size=256, dtype=np.uint64)
        with jax.enable_x64(False):
            rh, rl = pn._montmul48(
                jnp.asarray((a >> 32).astype(np.uint32)),
                jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
                jnp.asarray((b >> 32).astype(np.uint32)),
                jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32)),
                qh, ql, qih, qil)
        got = (np.asarray(rh).astype(object) << 32) | np.asarray(rl)
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


def test_fused_mul_s_matches_composition(rng):
    """iNTT(NTT(a) * s) fused kernel vs the unfused composition."""
    from matrix_fhe_tpu.config import get_params
    from matrix_fhe_tpu.ops.ntt import XNTT

    p = get_params("small")   # n=16, pack=8, rep=2
    xp = XNTT(p, use_pallas=True)    # interpret mode on CPU
    xr = XNTT(p, use_pallas=False)
    L, W, n = len(p.moduli), p.phi, p.n
    a = jnp.asarray(np.stack(
        [rng.integers(0, q, size=(W, n, n), dtype=np.uint64)
         for q in p.moduli]))
    s = jnp.asarray(np.stack(
        [rng.integers(0, q, size=(W, n), dtype=np.uint64)
         for q in p.moduli]))
    got = np.asarray(xp.mul_s(a, s))
    want = np.asarray(xr.mul_s(a, s))
    assert (got == want).all()


def test_pipelined_fused_ntt_matches(setup, rng, monkeypatch):
    """MFHE_NTT_PIPELINED=1 variant == the plain fused kernel (interpret)."""
    import os
    plan, ref, _ = setup
    monkeypatch.setenv("MFHE_NTT_PIPELINED", "1")
    pal = pn.PallasFourStepNTT(plan, row_tile=32)
    x = np.stack([rng.integers(0, q, size=(3, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xr = np.asarray(ref.forward(jnp.asarray(x)))
    xp = np.asarray(pal.forward(jnp.asarray(x)))
    assert (xr == xp).all()


def test_sliced_forward_inverse_bit_exact(setup, rng):
    """Round-2 sliced-table fold kernel == XLA oracle, both directions,
    at 35-bit and small-prime chunk counts."""
    plan, oracle, _ = setup
    sliced = pn.SlicedFourStepNTT(plan)
    x = np.stack([rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xj = jnp.asarray(x)
    want = oracle.forward(xj)
    got = sliced.forward(xj)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    np.testing.assert_array_equal(
        np.asarray(oracle.inverse(want)), np.asarray(sliced.inverse(want)))


def test_sliced_small_primes_bit_exact(rng):
    primes = generate_primes_1mod(2, 23, 1 << 11)
    plan = FourStepPlan.make(1024, primes)
    oracle, sliced = FourStepNTT(plan), pn.SlicedFourStepNTT(plan)
    x = np.stack([rng.integers(0, q, size=(1, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xj = jnp.asarray(x)
    np.testing.assert_array_equal(np.asarray(oracle.forward(xj)),
                                  np.asarray(sliced.forward(xj)))


def test_sliced_dma_variant_bit_exact(setup, rng, monkeypatch):
    """MFHE_SLICED_DMA=1 (explicit double-buffered DMA pipeline, grid (L,))
    == the grid-pipelined kernel, both directions."""
    plan, _, _ = setup
    base = pn.SlicedFourStepNTT(plan)
    monkeypatch.setenv("MFHE_SLICED_DMA", "1")
    dma = pn.SlicedFourStepNTT(plan)
    x = np.stack([rng.integers(0, q, size=(3, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xj = jnp.asarray(x)
    want = base.forward(xj)
    got = dma.forward(xj)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(base.inverse(want)),
                                  np.asarray(dma.inverse(want)))


def test_sliced_ctw_variant_bit_exact(setup, rng, monkeypatch):
    """MFHE_SLICED_CTW=1 (canonical R=2^64 inter-stage twiddle, 5-digit
    stage B) == the lazy-twiddle kernel, both directions, and composes
    with MFHE_SLICED_DMA=1."""
    plan, _, _ = setup
    base = pn.SlicedFourStepNTT(plan)
    monkeypatch.setenv("MFHE_SLICED_CTW", "1")
    ctw = pn.SlicedFourStepNTT(plan)
    monkeypatch.setenv("MFHE_SLICED_DMA", "1")
    both = pn.SlicedFourStepNTT(plan)
    x = np.stack([rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xj = jnp.asarray(x)
    want = base.forward(xj)
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(ctw.forward(xj)))
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(both.forward(xj)))
    np.testing.assert_array_equal(np.asarray(base.inverse(want)),
                                  np.asarray(ctw.inverse(want)))


def test_hybrid_stage_wide_modulus():
    """Transforms over a basis containing a >= 2^48 modulus (the reference's
    55-bit reserved P prime, config.h:48) must construct with use_pallas and
    stay bit-exact.  Round 4: wide limb runs now take the width-generic
    SlicedStage kernel (no XLA fallback) — this covers the end-to-end
    XNTT/WTransform plumbing over a mixed-width basis."""
    import numpy as np

    from matrix_fhe_tpu.config import get_params, generate_ntt_primes
    import dataclasses as dc
    from matrix_fhe_tpu.ops.ntt import XNTT
    from matrix_fhe_tpu.ops.wcrt import WTransform

    p0 = get_params("tiny")
    wide = generate_ntt_primes(1, 55, p0.n, p0.p)
    p = dc.replace(p0, name="tiny-wide", moduli=p0.moduli + wide)
    assert max(int(q).bit_length() for q in p.moduli) >= 48

    rng = np.random.default_rng(5)
    x = np.stack([rng.integers(0, q, (p.phi, p.n), dtype=np.uint64)
                  for q in p.moduli])
    import jax.numpy as jnp
    jx = jnp.asarray(x)

    xp = XNTT(p, use_pallas=True)
    xo = XNTT(p, use_pallas=False)
    assert (np.asarray(xp.forward(jx)) == np.asarray(xo.forward(jx))).all()
    assert (np.asarray(xp.inverse(xp.forward(jx))) == x).all()

    wp = WTransform(p, use_pallas=True)
    wo = WTransform(p, use_pallas=False)
    assert (np.asarray(wp.forward(jx)) == np.asarray(wo.forward(jx))).all()
    assert (np.asarray(wp.inverse(wp.forward(jx))) == x).all()


def test_sliced_stage_wide_55bit_bit_exact(rng):
    """Round 4 (VERDICT r3 Next #4): SlicedStage itself accepts moduli up to
    2^56 — the reference's 55-bit parity P prime (config.h:48) runs its QP
    transforms in-kernel.  Bit-exact vs the XLA-composed oracle on both
    sides at the ref W geometry (K=512), and MFHE_WIDE_FALLBACK=1 restores
    the round-3 XLA escape hatch with identical bits."""
    import os

    import jax.numpy as jnp

    from matrix_fhe_tpu.config import REF_P_MODULI
    from matrix_fhe_tpu.ops.modmatmul import BatchedModTransform
    from matrix_fhe_tpu.ops.pallas_ntt import (SlicedStage,
                                               make_stage_hybrid,
                                               split_u64, join_u64)

    q = REF_P_MODULI[0]
    assert q.bit_length() == 55
    for side, (W, K) in (("left", (64, 512)), ("right", (128, 128))):
        tbl = rng.integers(0, q, (1, W, K) if side == "left" else (1, K, K),
                           dtype=np.uint64)
        x = rng.integers(0, q, (1, K, 32) if side == "left" else (1, 32, K),
                         dtype=np.uint64)
        st = SlicedStage(tbl, (q,), side=side)
        assert st.chunks_t == 8
        oracle = BatchedModTransform(tbl, (q,), side=side)
        want = np.asarray(oracle(jnp.asarray(x)))
        got = np.asarray(join_u64(*st(*split_u64(jnp.asarray(x)))))
        np.testing.assert_array_equal(got, want)
        # the escape hatch returns the same bits through the same contract
        os.environ["MFHE_WIDE_FALLBACK"] = "1"
        try:
            fb = make_stage_hybrid(tbl, (q,), side=side)
        finally:
            del os.environ["MFHE_WIDE_FALLBACK"]
        got_fb = np.asarray(join_u64(*fb(*split_u64(jnp.asarray(x)))))
        np.testing.assert_array_equal(got_fb, want)


def test_sliced_lazy_a_default_and_bit_exact(setup, rng, monkeypatch):
    """Round 5: the lazy stage-A fold (skip the fold's canonicalization and
    let the lazy twiddle absorb the < 2q input) must be ON by default at
    the production widths — it is only legal when chunks_mid is unchanged,
    which __init__ verifies from the exact modulus bound — and bit-exact
    vs the canonical-A kernel both directions."""
    plan, _, _ = setup
    lazy = pn.SlicedFourStepNTT(plan)
    assert lazy.lazy_a, "lazy-A should enable itself at 35-bit moduli"
    monkeypatch.setenv("MFHE_SLICED_LAZYA", "0")
    base = pn.SlicedFourStepNTT(plan)
    assert not base.lazy_a and base.chunks_mid == lazy.chunks_mid
    x = np.stack([rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xj = jnp.asarray(x)
    want = base.forward(xj)
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(lazy.forward(xj)))
    np.testing.assert_array_equal(np.asarray(base.inverse(want)),
                                  np.asarray(lazy.inverse(want)))
    np.testing.assert_array_equal(np.asarray(lazy.inverse(want)), x)
    # composes with ILV (the software-pipelined unroll reads the same flag)
    monkeypatch.setenv("MFHE_SLICED_LAZYA", "1")
    monkeypatch.setenv("MFHE_SLICED_ILV", "1")
    monkeypatch.setenv("MFHE_SLICED_BB", "2")
    ilv = pn.SlicedFourStepNTT(plan)
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(ilv.forward(xj)))


def test_sliced_ilv_ctw_composes_bit_exact(setup, rng, monkeypatch):
    """Round 5: ILV + ctw (canonical twiddle under the software-pipelined
    unroll) is now a legal combination — bit-exact vs the base kernel."""
    plan, _, _ = setup
    base = pn.SlicedFourStepNTT(plan)
    monkeypatch.setenv("MFHE_SLICED_CTW", "1")
    monkeypatch.setenv("MFHE_SLICED_ILV", "1")
    monkeypatch.setenv("MFHE_SLICED_BB", "2")
    both = pn.SlicedFourStepNTT(plan)
    assert both.ctw and not both.lazy_a
    x = np.stack([rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xj = jnp.asarray(x)
    want = base.forward(xj)
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(both.forward(xj)))
    np.testing.assert_array_equal(np.asarray(base.inverse(want)),
                                  np.asarray(both.inverse(want)))


def test_sliced_kara_b_variant_bit_exact(setup, rng, monkeypatch):
    """MFHE_SLICED_KARA_B=1 (the "mixed" schedule from the round-3 roof
    analysis: sliced stage A + canonical Montgomery twiddle + Karatsuba
    CONVOLUTION-form stage B, 18 dots instead of 25) == the default
    sliced kernel, both directions, and composes with MFHE_SLICED_DMA=1."""
    plan, _, _ = setup
    base = pn.SlicedFourStepNTT(plan)
    monkeypatch.setenv("MFHE_SLICED_KARA_B", "1")
    kb = pn.SlicedFourStepNTT(plan)
    assert kb.ctw and kb._kb is not None
    monkeypatch.setenv("MFHE_SLICED_DMA", "1")
    both = pn.SlicedFourStepNTT(plan)
    x = np.stack([rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
                  for q in plan.moduli])
    xj = jnp.asarray(x)
    want = base.forward(xj)
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(kb.forward(xj)))
    np.testing.assert_array_equal(np.asarray(want),
                                  np.asarray(both.forward(xj)))
    np.testing.assert_array_equal(np.asarray(base.inverse(want)),
                                  np.asarray(kb.inverse(want)))
    np.testing.assert_array_equal(np.asarray(xj),
                                  np.asarray(kb.inverse(want)))


@pytest.mark.parametrize("bits", [35, 45])
def test_sliced_mul_ntt_kara_b_bit_exact(rng, monkeypatch, bits):
    """MFHE_SLICED_KARA_B=1 on the fused iNTT(NTT(a)*s) kernel: canonical
    s-product + Karatsuba convolution inverse stage == the lazy default,
    bit-exact, at both digit-grid widths (5 -> _Karatsuba5, 7 ->
    _Karatsuba7)."""
    q = int(generate_primes_1mod(1, bits, 1 << 8)[0])
    L, W, K, rep = 2, 32, 32, 2
    mods = [q, q]
    fwd = rng.integers(0, q, (L, W, K), dtype=np.uint64)
    inv = rng.integers(0, q, (L, W, K), dtype=np.uint64)
    s = rng.integers(0, q, (L, W, K), dtype=np.uint64)
    smont = (s.astype(object) * ((1 << 64) % q) % q).astype(np.uint64)
    d = rng.integers(0, q, (L, W * rep, K), dtype=np.uint64)
    base = pn.SlicedNttMulNtt(fwd, inv, mods, rep=rep)
    monkeypatch.setenv("MFHE_SLICED_KARA_B", "1")
    kb = pn.SlicedNttMulNtt(fwd, inv, mods, rep=rep)
    assert kb._kb is not None
    expected = {35: 5, 45: 7}[bits]
    assert kb._kb[0].chunks == expected
    dl, dh = pn.split_u64(jnp.asarray(d))
    sl, sh = pn.split_u64(jnp.asarray(smont))
    w0 = pn.join_u64(*base(dl, dh, sl, sh))
    w1 = pn.join_u64(*kb(dl, dh, sl, sh))
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))


def test_karatsuba4_scheme_28bit(rng, monkeypatch):
    """_Karatsuba4 (10 dots for the 4-digit/28-bit grid, vs 16 schoolbook):
    exact in the round-1 convolution stage AND as the kara_b mixed stage
    of the four-step kernel."""
    sch = pn._plan_scheme(256, 28)[0]
    assert type(sch).__name__ == "_Karatsuba4" and sch.n_dots == 10

    primes = generate_primes_1mod(2, 28, 1 << 11)
    plan = FourStepPlan.make(1 << 10, primes)
    x = np.stack([rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
                  for q in primes])
    xj = jnp.asarray(x)
    base = pn.SlicedFourStepNTT(plan)
    monkeypatch.setenv("MFHE_SLICED_KARA_B", "1")
    kb = pn.SlicedFourStepNTT(plan)
    assert kb._kb[0].chunks == 4
    want = base.forward(xj)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(kb.forward(xj)))
    np.testing.assert_array_equal(x, np.asarray(kb.inverse(want)))

    # round-1 convolution stage vs exact bigint oracle
    q = int(primes[0])
    T = rng.integers(0, q, (1, 64, 64), dtype=np.uint64)
    d = rng.integers(0, q, (1, 128, 64), dtype=np.uint64)
    st = pn.PallasStage(T, [q], side="right")
    assert type(st.scheme).__name__ == "_Karatsuba4"
    got = np.asarray(pn.join_u64(*st(*pn.split_u64(jnp.asarray(d)))))
    want = (d[0].astype(object) @ T[0].astype(object).T % q).astype(np.uint64)
    np.testing.assert_array_equal(got[0], want)


def test_mul_ntt_tile_mosaic_sublane_rule():
    """_mul_ntt_tile: the s block's sublane dim (tile//rep) must be a
    multiple of 8 or span all s rows — Mosaic rejects anything else on
    real TPU (round-5 runbook failure at the gl2 geometry, where the
    default 256-row tile gave tw=4)."""
    cases = [
        (16384, 32, 256),    # ring="gl" he.py geometry (tw=8, unchanged)
        (32768, 64, 256),    # ring="gl2" he2.py geometry (failed on chip)
        (32768, 64, 128),    # the row_tile that produced tw=2 on chip
        (1024, 64, 256),     # small W=16
        (256, 64, 256),      # W=4 < 8: full-array blocks are the only fit
        (2048, 2, 256),      # small rep
    ]
    for rows, rep, row_tile in cases:
        tile = pn._mul_ntt_tile(rows, rep, row_tile)
        tw = tile // rep
        s_rows = rows // rep
        assert rows % tile == 0 and tile % rep == 0, (rows, rep, tile)
        assert tw % 8 == 0 or tw == s_rows, (rows, rep, row_tile, tile)
    # the gl geometry keeps its exact previous tile (no perf regression)
    assert pn._mul_ntt_tile(16384, 32, 256) == 256


def test_fused_mul_s_gl2_geometry_matches(rng):
    """Fused mul_s at the ring=\"gl2\" rep=64 geometry (the shape that
    failed Mosaic lowering on chip) == unfused composition, bit-exact."""
    from matrix_fhe_tpu.config import get_params
    from matrix_fhe_tpu.ops.ntt import XNTT

    p = get_params("tiny")
    xp = XNTT(p, ring="gl2", use_pallas=True)
    xr = XNTT(p, ring="gl2", use_pallas=False)
    L, W, n = len(p.moduli), p.phi, p.n
    m = 2 * n
    a = jnp.asarray(np.stack(
        [rng.integers(0, q, size=(W, m, m), dtype=np.uint64)
         for q in p.moduli]))
    s = jnp.asarray(np.stack(
        [rng.integers(0, q, size=(W, m), dtype=np.uint64)
         for q in p.moduli]))
    got = np.asarray(xp.mul_s(a, s))
    want = np.asarray(xr.mul_s(a, s))
    assert (got == want).all()
