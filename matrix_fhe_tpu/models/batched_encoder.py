"""Batched encoder: 512 complex matrices -> W-CRT-eval packed plaintext.

Port of BatchedEncoder::encode_to_wntt_eval (batched_encoder.cu:161-228) as a
single fused, jittable function — the reference's 512-iteration host loop of
per-lane idft2 (with per-call cudaMalloc) becomes one batched einsum:

  1) per-lane XY-IDFT (V^-1 M V^-T)               [W, n, n] complex
  2) complex W-IDFT along the W axis               (w_idft_kernel)
  3) scale by Delta, llround, split into RNS       (quantize_coeff_to_rns)
  4) mod-q W-CRT forward to evaluation layout      (wntt_forward_matrix)

Canonical output layout is limb-major [L, W, n, n] (the reference emits
W-major [W][L][n^2]; see ops/wcrt.py for the layout rationale).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import GLParams
from ..tables import GLTables, build_tables
from ..ops.wcrt import WTransform
from .encoder import Encoder


class BatchedEncoder:
    def __init__(self, params: GLParams, tables: GLTables | None = None,
                 wt: WTransform | None = None,
                 fast_float: bool | None = None):
        t = tables or build_tables(params)
        self.params = params
        self.encoder = Encoder(params, t, fast_float=fast_float)
        self.wt = wt or WTransform(params, t)

    def encode_to_wntt_eval(self, m_re: jnp.ndarray, m_im: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[W, n, n] f64 pair -> ([L, W, n, n] u64, [L, W, n, n] u64)."""
        xr, xi = self.encoder.idft2(m_re, m_im)              # XY-IDFT per lane
        cr, ci = self.wt.dft_inverse_pair(xr, xi)            # W-IDFT (complex)
        rr, ri = self.encoder.quantize(cr, ci)               # scale+round+RNS
        return self.wt.forward(rr), self.wt.forward(ri)      # mod-q W-NTT

    def decode_from_wntt_eval(self, ev_re: jnp.ndarray, ev_im: jnp.ndarray,
                              delta_override: float | None = None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Inverse of encode_to_wntt_eval (the plaintext half of
        decode_eval_pair_to_complex, HE.cu:1619-1689): W-CRT inverse, exact
        CRT compose / Delta, complex W-DFT, per-lane XY decode.

        Fast path: the W-CRT inverse runs with M_l^{-1} folded into its
        tables and the centered compose/Delta happens via the float-exact
        mod-2^64 fold (ops/ddfloat.compose_scaled_to_float) instead of the
        7-limb big-int chain — bit-different in f64 ulps only."""
        delta = self.params.delta if delta_override is None else delta_override
        # the fast mod-2^64 compose (ops/ddfloat.py) recovers x from its
        # value mod 2^64 and so requires |x| < 2^63; Delta^2-scaled
        # homomorphic products (delta_override) exceed that at ref scale ->
        # route them through the exact big-int compose
        if self.encoder.fast_float and delta_override is None:
            from ..ops.ddfloat import compose_scaled_to_float
            p = self.params
            big_q = 1
            for q in p.moduli:
                big_q *= int(q)
            both = jnp.stack([ev_re, ev_im], axis=2)         # [L, W, 2, n, n]
            s2 = self.wt.inverse_scaled(both)
            f2 = compose_scaled_to_float(s2, p.moduli, big_q, delta)
            fr, fi = f2[:, 0], f2[:, 1]
        else:
            cr = self.wt.inverse(ev_re)
            ci = self.wt.inverse(ev_im)
            fr, fi = (self.encoder.dequantize_exact(cr, ci)
                      if delta_override is None else
                      self.encoder.dequantize_exact_delta(cr, ci, delta))
        er, ei = self.wt.dft_forward_pair(fr, fi)
        return self.encoder.dft2(er, ei)

    def unpack_eval(self, ev_re, ev_im):
        """Identity passthrough (unpack_eval_p17 degenerated to a copy,
        batched_encoder.cu:230-243)."""
        return ev_re, ev_im

    # -- u32-pair hot path (fast_float + Pallas only) -------------------------

    def encode_pair(self, m_re, m_im):
        """encode_to_wntt_eval producing u32 (lo, hi) plane pairs.

        When the fixed-point W-IDFT kernel is active and Delta is a power
        of two, the quantize runs on the kernel's integer output words
        (dynamic shift-round + one Montgomery multiply per limb) — the
        f64 reconstruct / llround / per-limb f64 mod disappear from the
        graph entirely."""
        m_flat = 1
        for d in m_re.shape[1:]:
            m_flat *= d
        if (self.encoder.delta_bits is not None
                and self.encoder.words_available(m_re)
                and self.wt.dft_words_available(m_flat)):
            # fully words-chained: XY-IDFT sandwich -> W-IDFT -> quantize
            # with exact integer shift-rounds at every link
            wr, wi, e = self.encoder.idft2_words(m_re, m_im)
            flat = tuple(w.reshape(w.shape[0], -1) for w in wr)
            flati = tuple(w.reshape(w.shape[0], -1) for w in wi)
            wr2, wi2, e2 = self.wt.dft_inverse_words_w(flat, flati, e)
            (rl, rh), (il, ih) = self.encoder.quantize_words(wr2, wi2, e2)
            shp = (rl.shape[0],) + m_re.shape
            rl, rh, il, ih = (a.reshape(shp) for a in (rl, rh, il, ih))
        else:
            xr, xi = self.encoder.idft2(m_re, m_im)
            cr, ci = self.wt.dft_inverse_pair(xr, xi)
            (rl, rh), (il, ih) = self.encoder.quantize_pair(cr, ci)
        return self.wt.forward_pair(rl, rh), self.wt.forward_pair(il, ih)

    def decode_pair(self, re_pair, im_pair):
        """decode_from_wntt_eval from u32 (lo, hi) plane pairs."""
        from ..ops.ddfloat import compose_scaled_pair_to_float
        p = self.params
        big_q = 1
        for q in p.moduli:
            big_q *= int(q)
        (rl, rh), (il, ih) = re_pair, im_pair
        # NOTE (r2): splitting this into per-component calls to avoid the
        # stack copies was measured 14 ms WORSE at ref scale - the stacked
        # single pass wins despite the copies.  The W-CRT inverse and the
        # CRT compose run as ONE fused kernel (SlicedInvCompose): the
        # scaled residues never touch HBM.
        bl = jnp.stack([rl, il], axis=2)                 # [L, W, 2, n, n]
        bh = jnp.stack([rh, ih], axis=2)
        f2 = self.wt.inverse_scaled_compose_pair(bl, bh, p.delta)
        fr, fi = f2[:, 0], f2[:, 1]
        m_flat = 1
        for d in fr.shape[1:]:
            m_flat *= d
        if (self.wt.dft_words_available(m_flat)
                and self.encoder.words_available(fr)):
            # words-chained decode: W-DFT -> XY-DFT sandwich with one f64
            # reconstruction at the very end
            wr, wi, e = self.wt.dft_forward_words(fr, fi)
            shp = fr.shape
            wr = tuple(w.reshape(shp) for w in wr)
            wi = tuple(w.reshape(shp) for w in wi)
            return self.encoder.dft2_words_in(wr, wi, e)
        er, ei = self.wt.dft_forward_pair(fr, fi)
        return self.encoder.dft2(er, ei)
