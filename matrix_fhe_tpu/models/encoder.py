"""Single-lane sigma-embedding encoder (CKKS-style, power-of-5 Vandermonde).

Port of the reference Encoder (src/core/encoder.cu:329-501): a 64x64 complex
message matrix is mapped to XY-coefficient space by V^-1 @ M @ V^-T where
V[j][k] = zeta_4n^(5^j * k), then scaled by Delta and split into RNS.

TPU-first: all lanes are batched with einsum over the leading W axis instead
of the reference's per-lane host loop with per-call cudaMalloc
(batched_encoder.cu:192-196, HE.cu:1675-1679); float64 (emulated on TPU)
reproduces the reference's double math.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GLParams
from ..tables import GLTables, build_tables
from ..ops.crt import CRTComposer
from .rng import llround

F64 = jnp.float64


def _cm(ar, ai, br, bi) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Complex matmul over trailing two dims with leading batch: a @ b."""
    rr = jnp.einsum("...ij,...jk->...ik", ar, br) - \
        jnp.einsum("...ij,...jk->...ik", ai, bi)
    ri = jnp.einsum("...ij,...jk->...ik", ar, bi) + \
        jnp.einsum("...ij,...jk->...ik", ai, br)
    return rr, ri


class Encoder:
    """sigma-embedding over one (or a batch of) n x n complex matrices."""

    def __init__(self, params: GLParams, tables: GLTables | None = None,
                 fast_float: bool | None = None,
                 dd_transforms: bool | None = None):
        from ..ops.ddfloat import dd_transforms_default, fast_float_default

        self.params = params
        t = tables or build_tables(params)
        self.tables = t
        self._v_re = jnp.asarray(t.enc_v.real)
        self._v_im = jnp.asarray(t.enc_v.imag)
        self._vi_re = jnp.asarray(t.enc_v_inv.real)
        self._vi_im = jnp.asarray(t.enc_v_inv.imag)
        self._composer = CRTComposer(t)
        self.fast_float = (fast_float_default() if fast_float is None
                           else fast_float)
        self.dd_transforms = (dd_transforms_default() if dd_transforms is None
                              else dd_transforms)
        from ..ops.fpmatmul import ExactComplexMatmul, fp_transforms_default
        self._fp_v = self._fp_vi = None
        if fp_transforms_default() and not self.dd_transforms:
            self._fp_v = ExactComplexMatmul(t.enc_v)
            self._fp_vi = ExactComplexMatmul(t.enc_v_inv)

    def _cm(self, ar, ai, br, bi):
        if self.dd_transforms:
            from ..ops.ddfloat import dd_cmatmul
            return dd_cmatmul(ar, ai, br, bi)
        return _cm(ar, ai, br, bi)

    # -- complex transforms (batch over leading dims) -------------------------

    def _sandwich(self, vr, vi, m_re, m_im, fp=None):
        """V @ M @ V^T over a [W, n, n] batch.  XLA's emulated-f64 batched
        small-K matmul is ~2x slower than the same contraction phrased as two
        WIDE 2-D matmuls ([n, n] @ [n, W*n]); the summation order per output
        is identical, so results are bit-identical to the naive einsum.
        When an ExactComplexMatmul is supplied (TPU), the wide matmuls run
        as exact fixed-point MXU kernels instead of emulated f64."""
        if m_re.ndim == 2:          # single lane: keep the simple form
            tr, ti = self._cm(vr, vi, m_re, m_im)
            return self._cm(tr, ti, vr.T, vi.T)

        if fp is not None:
            def cm2d(ar_unused, ai_unused, br, bi):
                return fp(br, bi)
        else:
            def cm2d(ar, ai, br, bi):
                return (ar @ br - ai @ bi, ar @ bi + ai @ br)

        W, n = m_re.shape[0], m_re.shape[-1]
        mr = jnp.swapaxes(m_re, 0, 1).reshape(n, -1)
        mi = jnp.swapaxes(m_im, 0, 1).reshape(n, -1)
        tr, ti = cm2d(vr, vi, mr, mi)                    # [n(i'), W*n(j)]
        sr = jnp.transpose(tr.reshape(n, W, n), (2, 1, 0)).reshape(n, -1)
        si = jnp.transpose(ti.reshape(n, W, n), (2, 1, 0)).reshape(n, -1)
        ur, ui = cm2d(vr, vi, sr, si)                    # [n(j'), W*n(i')]
        return (jnp.transpose(ur.reshape(n, W, n), (1, 2, 0)),
                jnp.transpose(ui.reshape(n, W, n), (1, 2, 0)))

    # -- words-chained transforms (fp kernels only): the f64 reconstruct /
    # requantize round trips between chained ExactComplexMatmuls collapse
    # to exact integer shift-rounds of the kernels' own output words --------

    @staticmethod
    def _perm_words(words, f):
        return tuple(f(w) for w in words)

    def _sandwich_words_tail(self, fp, wr, wi, e1, W, n):
        """Second transform of a V (..) V^T sandwich on words from the
        first: lane reorder (W, j) -> (W, i'), chained matmul, then the
        [W, n, n] output reorder — all on the u32 word planes."""
        def perm1(x):
            return jnp.transpose(x.reshape(n, W, n), (2, 1, 0)).reshape(n, -1)

        wr = self._perm_words(wr, perm1)
        wi = self._perm_words(wi, perm1)
        ur, ui, e2 = fp.call_words_w(wr, wi, e1)

        def perm2(x):
            return jnp.transpose(x.reshape(n, W, n), (1, 2, 0))

        return (self._perm_words(ur, perm2), self._perm_words(ui, perm2), e2)

    def idft2_words(self, m_re, m_im):
        """idft2 returning fp-kernel words ([W, n, n] planes) + scale.
        Requires the fp path (caller gates on words_available)."""
        fp = self._fp_vi
        W, n = m_re.shape[0], m_re.shape[-1]
        mr = jnp.swapaxes(m_re.astype(F64), 0, 1).reshape(n, -1)
        mi = jnp.swapaxes(m_im.astype(F64), 0, 1).reshape(n, -1)
        wr, wi, e1 = fp.call_words(mr, mi)
        return self._sandwich_words_tail(fp, wr, wi, e1, W, n)

    def dft2_words_in(self, words_r, words_i, e_scale):
        """dft2 consuming words ([W, n, n] planes, e.g. from
        WTransform.dft_forward_words) and returning the final f64 pair —
        the single f64 reconstruction of a fully words-chained decode."""
        fp = self._fp_v
        W, n = words_r[0].shape[0], words_r[0].shape[-1]

        def perm0(x):
            return jnp.swapaxes(x, 0, 1).reshape(n, -1)

        wr = self._perm_words(words_r, perm0)
        wi = self._perm_words(words_i, perm0)
        ur, ui, e1 = fp.call_words_w(wr, wi, e_scale)
        ur, ui, e2 = self._sandwich_words_tail(fp, ur, ui, e1, W, n)
        from ..ops.fpmatmul import ExactComplexMatmul
        return (ExactComplexMatmul.words_to_f64(ur, e2),
                ExactComplexMatmul.words_to_f64(ui, e2))

    def words_available(self, m_re) -> bool:
        return (self._fp_vi is not None and self._fp_v is not None
                and m_re.ndim >= 3
                and (m_re.shape[0] * m_re.shape[-2]) % 8 == 0)

    def idft2(self, m_re, m_im) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """V^-1 @ M @ (V^-1)^T  (encoder.cu:460-467)."""
        if self.dd_transforms:
            tr, ti = self._cm(self._vi_re, self._vi_im,
                              m_re.astype(F64), m_im.astype(F64))
            return self._cm(tr, ti, self._vi_re.T, self._vi_im.T)
        return self._sandwich(self._vi_re, self._vi_im,
                              m_re.astype(F64), m_im.astype(F64),
                              fp=self._fp_vi)

    def dft2(self, e_re, e_im) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """V @ E @ V^T  (decode_from_eval_complex, encoder.cu:492-501)."""
        if self.dd_transforms:
            tr, ti = self._cm(self._v_re, self._v_im,
                              e_re.astype(F64), e_im.astype(F64))
            return self._cm(tr, ti, self._v_re.T, self._v_im.T)
        return self._sandwich(self._v_re, self._v_im,
                              e_re.astype(F64), e_im.astype(F64),
                              fp=self._fp_v)

    # -- quantize / RNS ---------------------------------------------------------

    def quantize(self, c_re, c_im) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """llround(x * Delta) split into RNS limbs: [..., n, n] f64 ->
        [L, ..., n, n] uint64 (quantize_soa_kernel, encoder.cu:36-50)."""
        delta = np.float64(self.params.delta)
        if self.fast_float:
            # pure-f64 exact path: avoids XLA's emulated 64-bit int modulo
            # (valid while |x*Delta| < 2^52; ref magnitudes are ~2^46)
            from ..ops import modmath as mm
            (rl, rh), (il, ih) = self.quantize_pair(c_re, c_im)
            return mm.pair_join(rl, rh), mm.pair_join(il, ih)
        ir = llround(c_re * delta)
        ii = llround(c_im * delta)
        outs_r, outs_i = [], []
        for q in self.params.moduli:
            qq = jnp.int64(int(q))
            mr = ir % qq
            mi = ii % qq
            outs_r.append(jnp.where(mr < 0, mr + qq, mr).astype(jnp.uint64))
            outs_i.append(jnp.where(mi < 0, mi + qq, mi).astype(jnp.uint64))
        return jnp.stack(outs_r), jnp.stack(outs_i)

    def quantize_pair(self, c_re, c_im):
        """quantize() returning u32 (lo, hi) plane pairs (fast path only)."""
        from ..ops.ddfloat import f64_mod_to_pair, llround_f64
        delta = np.float64(self.params.delta)
        vr = llround_f64(c_re * delta)
        vi = llround_f64(c_im * delta)
        prs = [f64_mod_to_pair(vr, int(q)) for q in self.params.moduli]
        pis = [f64_mod_to_pair(vi, int(q)) for q in self.params.moduli]
        return ((jnp.stack([p[0] for p in prs]),
                 jnp.stack([p[1] for p in prs])),
                (jnp.stack([p[0] for p in pis]),
                 jnp.stack([p[1] for p in pis])))

    @property
    def delta_bits(self):
        """log2(Delta) when Delta is an exact power of two, else None."""
        d = float(self.params.delta)
        db = int(round(np.log2(d)))
        return db if 2.0 ** db == d else None

    def quantize_words(self, words_re, words_im, e_scale):
        """Integer quantize straight from ExactComplexMatmul.call_words
        output: round(c * Delta) is an exact dynamic right shift of the
        sign-magnitude words (Delta a power of two), and each RNS residue
        is one u64 Montgomery multiply — no f64 anywhere (the f64
        reconstruct + llround + per-limb f64 mod of the quantize_pair
        route was the encode pipeline's largest non-transform cost)."""
        from ..ops import modmath as mm
        from ..ops.ddfloat import words_shr_round
        db = self.delta_bits
        assert db is not None, "quantize_words requires a power-of-two Delta"
        diff = e_scale - np.int32(db)
        # ADVICE r3: e_scale <= delta_bits means the message magnitude is
        # beyond the documented contract; clamping the shift to 1 would
        # silently scale every residue by a wrong power of two.  Fail loudly
        # host-side when concrete; when traced, ZERO every residue instead
        # (a poisoned-but-unmistakable output: decode returns ~0, never a
        # subtly mis-scaled value).  A callback-based warning (jax.debug
        # .print) is deliberately NOT used here: host callbacks cannot
        # cross-platform-lower (jax.export platforms=("tpu",) from a CPU
        # host — the offline preflight path — fails with a backend/platform
        # mismatch on any debug callback).
        if not isinstance(diff, jax.core.Tracer):
            if int(jnp.min(diff)) < 1:
                raise ValueError(
                    "quantize_words: message magnitude exceeds the encode "
                    f"contract (e_scale={int(jnp.min(e_scale))} <= "
                    f"delta_bits={db}); residues would be mis-scaled")
        ok = (jnp.min(diff) >= 1).astype(jnp.uint64)
        sh = jnp.maximum(diff, np.int32(1))
        consts = [mm.MontConsts.make(int(q)) for q in self.params.moduli]
        outs = []
        for m0, m1, m2, sg in (words_re, words_im):
            lo, hi = words_shr_round(m0, m1, m2, sh)
            v = mm.pair_join(lo, hi) * ok
            neg = sg.astype(jnp.uint64) != 0
            los, his = [], []
            for c in consts:
                r = mm.mont_mul(v, mm.u64c(c.r_mod), mm.u64c(c.q),
                                mm.u64c(c.qinv_neg))
                r = jnp.where(neg & (r != 0), mm.u64c(c.q) - r, r)
                l32, h32 = mm.pair_split(r)
                los.append(l32)
                his.append(h32)
            outs.append((jnp.stack(los), jnp.stack(his)))
        return outs[0], outs[1]

    def encode(self, m_re, m_im):
        """Full lane encode: complex matrix -> RNS pair in XY-eval basis
        (Encoder::encode, encoder.cu:446-458)."""
        cr, ci = self.idft2(m_re, m_im)
        return self.quantize(cr, ci)

    def dequantize_exact(self, rns_re, rns_im):
        """Exact big-int CRT -> f64 / Delta (dequantize_exact_kernel,
        encoder.cu:112-150); inputs [L, ..., n, n]."""
        return self.dequantize_exact_delta(rns_re, rns_im, self.params.delta)

    def dequantize_exact_delta(self, rns_re, rns_im, delta):
        """dequantize_exact with an explicit scale (e.g. Delta^2 for
        un-rescaled homomorphic products)."""
        return (self._composer.compose_to_float(rns_re, delta),
                self._composer.compose_to_float(rns_im, delta))

    def decode_lane_from_rns_eval(self, rns_re, rns_im):
        """encoder.cu:470-490: exact dequantize then V E V^T."""
        er, ei = self.dequantize_exact(rns_re, rns_im)
        return self.dft2(er, ei)
