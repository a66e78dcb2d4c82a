"""W-axis transforms: mod-q W-CRT (Phi_p evaluation) and complex W-DFT.

The reference evaluates/interpolates the W axis with one output element per
thread and an O(phi) inner loop (wntt_forward_matrix_kernel HE.cu:716-747,
wntt_inverse_matrix_kernel HE.cu:751-781, wdft_* HE.cu:1116-1202).  Here both
directions are plain [phi x phi] @ [phi x M] matrix products:

  * mod-q path: exact chunked int8 MXU matmuls (ops/modmatmul.py) against the
    per-limb Vandermonde tables V[l] / V[l]^-1;
  * complex path: float64 matmuls (XLA emulates f64 on TPU exactly enough —
    53-bit mantissa — to reproduce the reference's double math).

Canonical data layout here is limb-major [L, W, n, n] (the reference is
W-major, HE.cuh:17-33); limb-major puts the modulus batch axis first for
batched MXU dots and for zero-communication limb sharding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import GLParams
from ..tables import GLTables, build_tables
from .crt import CRTComposer, centered_i64_to_rns
from .modmatmul import BatchedModTransform, limb_runs


class WTransform:
    """Forward/inverse W-CRT over all RNS limbs + complex W-DFT.

    On TPU the mod-q matmuls run as fused Pallas stage kernels (side='left';
    see ops/pallas_ntt.py); elsewhere the XLA-composed chunked-int8 path is
    used.  Both are bit-exact.
    """

    def __init__(self, params: GLParams, tables: GLTables | None = None,
                 use_pallas: bool | None = None,
                 fast_float: bool | None = None):
        import jax

        from .ddfloat import dd_transforms_default, fast_float_default

        self._fast_float = (fast_float_default() if fast_float is None
                            else fast_float)
        self._dd_transforms = dd_transforms_default()
        self.params = params
        t = tables or build_tables(params)
        self.tables = t
        self._wide = max(int(q).bit_length() for q in params.moduli) >= 48
        self._fwd = BatchedModTransform(t.w_fwd, params.moduli, side="left")
        self._inv = BatchedModTransform(t.w_inv, params.moduli, side="left")
        # limb-0-only inverse for the centered test path (HE.cu:1101)
        self._inv0 = BatchedModTransform(t.w_inv[:1], params.moduli[:1],
                                         side="left")
        from ._backend import tpu_kernels_default
        self._use_pallas = (tpu_kernels_default()
                            if use_pallas is None else use_pallas)
        self._fwd_p = self._inv_p = None
        if self._use_pallas:
            from .pallas_ntt import make_stage_hybrid
            self._runs = limb_runs(params.moduli)
            self._fwd_p = [make_stage_hybrid(t.w_fwd[lo:hi],
                                             params.moduli[lo:hi],
                                             side="left")
                           for lo, hi, _ in self._runs]
            self._inv_p = [make_stage_hybrid(t.w_inv[lo:hi],
                                             params.moduli[lo:hi],
                                             side="left")
                           for lo, hi, _ in self._runs]

        self._composer = CRTComposer(t)
        if self._fast_float:
            self._inv_scaled  # materialize eagerly (never inside a trace)
            if self._use_pallas and not self._wide:
                self._inv_compose  # 55-bit P limbs exceed the kernel bound
        from .fpmatmul import ExactComplexMatmul, fp_transforms_default
        self._fp_dft = self._fp_idft = None
        if fp_transforms_default() and not self._dd_transforms:
            self._fp_dft = ExactComplexMatmul(t.wdft)
            self._fp_idft = ExactComplexMatmul(t.wdft_inv)
        # complex tables as separate f64 re/im parts
        self._dft_re = jnp.asarray(t.wdft.real)
        self._dft_im = jnp.asarray(t.wdft.imag)
        self._idft_re = jnp.asarray(t.wdft_inv.real)
        self._idft_im = jnp.asarray(t.wdft_inv.imag)

    def _apply_pallas(self, stages, flat: jnp.ndarray) -> jnp.ndarray:
        from .pallas_ntt import join_u64, split_u64
        outs = []
        for (lo, hi, _), st in zip(self._runs, stages):
            dlo, dhi = split_u64(flat[lo:hi])
            olo, ohi = st(dlo, dhi)
            outs.append(join_u64(olo, ohi))
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

    def _apply_pallas_pair(self, stages, lo32, hi32):
        outs_l, outs_h = [], []
        for (a, b, _), st in zip(self._runs, stages):
            ol, oh = st(lo32[a:b], hi32[a:b])
            outs_l.append(ol)
            outs_h.append(oh)
        if len(outs_l) == 1:
            return outs_l[0], outs_h[0]
        return jnp.concatenate(outs_l), jnp.concatenate(outs_h)

    def forward_pair(self, lo32, hi32):
        """forward() on u32 lo/hi planes [L, W, ...] (no u64 round trips)."""
        L, W = lo32.shape[0], lo32.shape[1]
        shape = lo32.shape
        fl = lo32.reshape(L, W, -1)
        fh = hi32.reshape(L, W, -1)
        if self._fwd_p is not None and fl.shape[-1] % 8 == 0:
            ol, oh = self._apply_pallas_pair(self._fwd_p, fl, fh)
            return ol.reshape(shape), oh.reshape(shape)
        from ..ops import modmath as mm
        out = self._fwd(mm.pair_join(fl, fh)).reshape(shape)
        return mm.pair_split(out)

    def inverse_scaled_pair(self, lo32, hi32):
        """inverse_scaled() on u32 lo/hi planes [L, W, ...]."""
        L, W = lo32.shape[0], lo32.shape[1]
        shape = lo32.shape
        fl = lo32.reshape(L, W, -1)
        fh = hi32.reshape(L, W, -1)
        st = self._inv_scaled
        if self._use_pallas and fl.shape[-1] % 8 == 0:
            ol, oh = self._apply_pallas_pair(st, fl, fh)
            return ol.reshape(shape), oh.reshape(shape)
        from ..ops import modmath as mm
        out = st(mm.pair_join(fl, fh)).reshape(shape)
        return mm.pair_split(out)

    # -- mod-q path ----------------------------------------------------------

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """[L, W, ...] uint64 coeff -> eval (out[w] = sum_r V[w,r] x[r])."""
        L, W = x.shape[0], x.shape[1]
        flat = x.reshape(L, W, -1)
        if self._fwd_p is not None and flat.shape[-1] % 8 == 0:
            return self._apply_pallas(self._fwd_p, flat).reshape(x.shape)
        return self._fwd(flat).reshape(x.shape)

    def inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        """[L, W, ...] uint64 eval -> coeff (out[r] = sum_w V^-1[r,w] x[w])."""
        L, W = x.shape[0], x.shape[1]
        flat = x.reshape(L, W, -1)
        if self._inv_p is not None and flat.shape[-1] % 8 == 0:
            return self._apply_pallas(self._inv_p, flat).reshape(x.shape)
        return self._inv(flat).reshape(x.shape)

    @functools.cached_property
    def _inv_scaled(self):
        """Inverse-transform stages with the CRT constant M_l^{-1} mod q_l
        folded into the tables, so the fast float-exact decode compose
        (ops/ddfloat.compose_scaled_to_float) needs no per-element modmul.
        NOTE: must be materialized OUTSIDE any jit trace (jnp constants are
        created here); __init__ touches it eagerly on the fast path."""
        t = self.tables
        p = self.params
        scaled = np.empty_like(t.w_inv)
        for l, q in enumerate(p.moduli):
            q = int(q)
            scaled[l] = (t.w_inv[l].astype(object) * int(t.crt_inv[l]) % q
                         ).astype(np.uint64)
        if self._use_pallas:
            from .pallas_ntt import make_stage_hybrid
            return [make_stage_hybrid(scaled[lo:hi], p.moduli[lo:hi],
                                      side="left")
                    for lo, hi, _ in self._runs]
        return BatchedModTransform(scaled, p.moduli, side="left")

    @functools.cached_property
    def _inv_compose(self):
        """Fused scaled-inverse + CRT-compose kernels, one per limb run
        (SlicedInvCompose): the r' intermediate never touches HBM.  Same
        out-of-trace materialization rule as _inv_scaled."""
        t = self.tables
        p = self.params
        big_q = 1
        for q in p.moduli:
            big_q *= int(q)
        scaled = np.empty_like(t.w_inv)
        for l, q in enumerate(p.moduli):
            q = int(q)
            scaled[l] = (t.w_inv[l].astype(object) * int(t.crt_inv[l]) % q
                         ).astype(np.uint64)
        from .pallas_ntt import SlicedInvCompose
        return big_q, [SlicedInvCompose(scaled[lo:hi], p.moduli[lo:hi],
                                        big_q)
                       for lo, hi, _ in self._runs]

    def inverse_scaled_compose_pair(self, lo32, hi32, delta):
        """Fused inverse_scaled + centered CRT compose / delta: u32-pair
        eval residues [L, W, ...] -> f64 [W, ...].  Falls back to the
        two-pass path off-TPU / for non-sliced configs."""
        from .ddfloat import compose_tail_from_partials

        L, W = lo32.shape[0], lo32.shape[1]
        shape = lo32.shape
        fl = lo32.reshape(L, W, -1)
        fh = hi32.reshape(L, W, -1)
        import os
        fused_ok = (self._use_pallas and not self._wide
                    and fl.shape[-1] % 8 == 0
                    and os.environ.get("MFHE_FUSED_COMPOSE", "1") == "1"
                    and os.environ.get("MFHE_STAGE_IMPL",
                                       "sliced") == "sliced")
        if not fused_ok:
            from .ddfloat import compose_scaled_pair_to_float
            p = self.params
            big_q = 1
            for q in p.moduli:
                big_q *= int(q)
            sl, sh = self.inverse_scaled_pair(lo32, hi32)
            return compose_scaled_pair_to_float(
                sl.reshape(L, W, -1), sh.reshape(L, W, -1), p.moduli,
                big_q, self.params.delta if delta is None else delta
            ).reshape(shape[1:])
        big_q, kerns = self._inv_compose
        acc_l = acc_h = kacc = None
        for (a, b, _), kern in zip(self._runs, kerns):
            pl_, ph_, kk = kern(fl[a:b], fh[a:b])
            if acc_l is None:
                acc_l, acc_h, kacc = pl_, ph_, kk
            else:
                import jax.numpy as _jnp
                s = acc_l + pl_
                c = (s < pl_).astype(_jnp.uint32)
                acc_l = s
                acc_h = acc_h + ph_ + c
                kacc = kacc + kk
        out = compose_tail_from_partials(acc_l, acc_h, kacc, big_q, delta)
        return out.reshape(shape[1:])

    def inverse_scaled(self, x: jnp.ndarray) -> jnp.ndarray:
        """inverse() with outputs pre-multiplied by M_l^{-1} mod q_l."""
        L, W = x.shape[0], x.shape[1]
        flat = x.reshape(L, W, -1)
        st = self._inv_scaled
        if self._use_pallas and flat.shape[-1] % 8 == 0:
            return self._apply_pallas(st, flat).reshape(x.shape)
        if self._use_pallas:
            raise ValueError("inverse_scaled needs M % 8 == 0 on TPU")
        return st(flat).reshape(x.shape)

    # -- centered-integer path (test oracles; HE.cu:1029-1114) ----------------

    def forward_centered(self, x_centered: jnp.ndarray) -> jnp.ndarray:
        """int64 [W, ...] coeff -> centered int64 eval via all limbs + exact
        CRT compose (wntt_forward_centered_kernel, HE.cu:1029-1081), including
        its int64 saturation semantics (he_big_to_i64_checked, HE.cu:904-915).

        Fidelity note: per-limb eta roots are searched independently
        (HE.cu:119-133), so the CRT-composed evaluation is a ~Q-sized integer
        whenever num_limbs > 1; the reference kernel then *saturates* to
        INT64_MAX/MIN, which breaks the limb-0 congruence that
        wntt_inverse_centered (HE.cu:1083-1114, limb 0 only) relies on.  The
        centered roundtrip oracle is therefore only exactly invertible when
        Q < 2^63 (e.g. the single-limb "tiny1" preset); this port reproduces
        the reference behavior bit-for-bit either way."""
        rns = centered_i64_to_rns(x_centered, self.params.moduli)
        ev = self.forward(rns)
        return self._composer.compose_centered_i64(ev)

    def inverse_centered(self, x_centered: jnp.ndarray) -> jnp.ndarray:
        """int64 [W, ...] eval -> centered int64 coeff using limb 0 only
        (wntt_inverse_centered_kernel, HE.cu:1083-1114)."""
        q0 = int(self.params.moduli[0])
        qq = jnp.int64(q0)
        m = x_centered % qq
        m = jnp.where(m < 0, m + qq, m).astype(jnp.uint64)
        ev = self._inv0(m[None].reshape(1, x_centered.shape[0], -1))
        ev = ev.reshape(x_centered.shape)
        half = jnp.uint64(q0 >> 1)
        centered = jnp.where(ev > half,
                             ev.astype(jnp.int64) - qq, ev.astype(jnp.int64))
        return centered

    # -- complex path ----------------------------------------------------------

    def _cmatmul(self, mr, mi, xr, xi) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Complex [W,W] @ [W,M] as four real f64 matmuls (split-f32 MXU
        products when dd transforms are opted in; see ops/ddfloat.py)."""
        if self._dd_transforms:
            from .ddfloat import dd_cmatmul
            return dd_cmatmul(mr, mi, xr, xi)
        yr = mr @ xr - mi @ xi
        yi = mr @ xi + mi @ xr
        return yr, yi

    def dft_forward_pair(self, re, im) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """f64/int pair [W, ...] coeff -> eval (wdft_forward_pair_kernel)."""
        shape = re.shape
        xr = re.reshape(shape[0], -1).astype(jnp.float64)
        xi = im.reshape(shape[0], -1).astype(jnp.float64)
        if self._fp_dft is not None and xr.shape[1] % 8 == 0:
            yr, yi = self._fp_dft(xr, xi)
        else:
            yr, yi = self._cmatmul(self._dft_re, self._dft_im, xr, xi)
        return yr.reshape(shape), yi.reshape(shape)

    def dft_inverse_pair(self, re, im) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """f64 pair [W, ...] eval -> coeff (wdft_inverse_pair_kernel /
        w_idft_kernel, batched_encoder.cu:104-123)."""
        shape = re.shape
        xr = re.reshape(shape[0], -1).astype(jnp.float64)
        xi = im.reshape(shape[0], -1).astype(jnp.float64)
        if self._fp_idft is not None and xr.shape[1] % 8 == 0:
            yr, yi = self._fp_idft(xr, xi)
        else:
            yr, yi = self._cmatmul(self._idft_re, self._idft_im, xr, xi)
        return yr.reshape(shape), yi.reshape(shape)

    def dft_inverse_words(self, re, im):
        """dft_inverse_pair as raw fp-kernel words: ((m0,m1,m2,sg) re,
        (..) im, e_scale), each word [W, prod(rest)] u32 — the integer
        encode-quantize input.  Caller must ensure the fp path is active
        (dft_words_available)."""
        shape = re.shape
        xr = re.reshape(shape[0], -1).astype(jnp.float64)
        xi = im.reshape(shape[0], -1).astype(jnp.float64)
        return self._fp_idft.call_words(xr, xi)

    def dft_inverse_words_w(self, words_re, words_im, e_scale):
        """dft_inverse_pair chained on upstream fp-kernel words
        ([W, M] planes in, [W, M] planes out)."""
        return self._fp_idft.call_words_w(words_re, words_im, e_scale)

    def dft_forward_words(self, re, im):
        """dft_forward_pair as raw fp-kernel words (f64 in, words out)."""
        shape = re.shape
        xr = re.reshape(shape[0], -1).astype(jnp.float64)
        xi = im.reshape(shape[0], -1).astype(jnp.float64)
        return self._fp_dft.call_words(xr, xi)

    def dft_words_available(self, m: int) -> bool:
        return (self._fp_idft is not None and self._fp_dft is not None
                and m % 8 == 0)

    @property
    def composer(self) -> CRTComposer:
        return self._composer
