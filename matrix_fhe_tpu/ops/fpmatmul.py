"""Exact fixed-point complex matmul on the MXU.

XLA emulates f64 in software on TPU, which makes the complex transform
halves of encode/decode (sigma-embedding V E V^T, 512-point W-DFT) the
dominant pipeline cost, and f32-accumulated alternatives carry a ~2^-20
RELATIVE error floor (every partial sum rounds) that breaks the reference
driver's ABSOLUTE 1e-4 threshold at 511-scale messages.

This module computes  Y = T @ X  (complex, contraction K) EXACTLY over
scaled integers:

  * T is quantized once host-side to t_int = round(T * 2^st) and split into
    BALANCED 7-bit digit planes (int8 in [-64, 63]) — exact, since t_int
    fits the digit range;
  * X is scaled by a dynamic power of two so max|x_int| <= 2^37 (the
    scale is exact in f64), rounded, and carried as u32 lo/hi
    two's-complement planes; the kernel extracts 6 balanced digits with an
    in-register borrow chain;
  * int8 x int8 digit dots on the MXU reconstruct the product diagonals,
    which pack (with the same bias + 128-bit-complement trick as the
    modular kernels) into the EXACT integer sum_k t_int x_int — two's
    complement mod 2^128;
  * the kernel negates-if-negative in u32 words and emits magnitude words
    + sign, so the final f64 reconstruction has no cancellation: the only
    error is input quantization (2^-38 of max|X|) plus table quantization
    (per-table scale fills the 5-digit range, e.g. 2^-33 for unit-norm
    DFT tables, 2^-39+ for small-norm inverses).  Full ref pipeline error
    measured 2.0e-7 — and 2.3x faster than XLA's emulated f64.

Complex combination happens at the int32 diagonal level via 3-mult
Karatsuba (P1 = tr*dr, P2 = ti*di, P3 = (tr+ti)*(dr+di); re = P1-P2,
im = P3-P1-P2), so one complex product costs 3 digit-dot sets (a 25% MXU
cut over the rr/ri/ir/ii form) and 2 packs.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _backend
from .pallas_ntt import CHUNK_BITS, _sum_words

U32 = jnp.uint32
F64 = jnp.float64
# Dynamic input scaling targets |x_int| <= 2^X_BITS; the balanced digit
# count follows (exactness bound: |v| < 2^(7*chunks - 2)).  MFHE_FP_XBITS
# overrides (read once at import): 37 (default) -> 6 data digits; 31 ->
# 5 digits, a 17% MXU cut on every fp-transform kernel at ~2^-31-relative
# input quantization instead of 2^-38 — measured-headroom trade for the
# roundtrip target (<25 ms, err <= 1e-4; see docs/PERF.md round 4).
X_BITS = int(_os.environ.get("MFHE_FP_XBITS", "37"))
assert 20 <= X_BITS <= 44, "MFHE_FP_XBITS out of the supported range"
DATA_CHUNKS = -(-(X_BITS + 3) // 7)   # digits cover |x_int| <= 2^X_BITS
T_DIGITS = 5          # table digit planes; scale chosen per table (below)
# the exact sum stays < K * 2^38 * 2^34 = 2^81 << 2^95 (the 4-word pack)


def _balanced_digits(lo, hi, chunks):
    """Balanced 7-bit digit planes (int32 in [-64, 63]) of the
    two's-complement (lo, hi) pair; exact for |value| < 2^(7*chunks - 2)."""
    digits = []
    carry = None
    for j in range(chunks):
        s = CHUNK_BITS * j
        if s + CHUNK_BITS <= 32:
            c = (lo >> np.uint32(s)) & np.uint32(127) if s else \
                lo & np.uint32(127)
        elif s >= 32:
            c = (hi >> np.uint32(s - 32)) & np.uint32(127)
        else:
            c = ((lo >> np.uint32(s)) | (hi << np.uint32(32 - s))) \
                & np.uint32(127)
        c = c.astype(jnp.int32)
        if carry is not None:
            c = c + carry
        if j < chunks - 1:
            ge = (c >= 64).astype(jnp.int32)
            digits.append(c - 128 * ge)
            carry = ge
        else:
            # top digit: the borrow-adjusted residue of the (sign-extended)
            # value; in range for |value| < 2^(7*chunks - 2)
            sign_bits = (hi >> np.uint32(31)).astype(jnp.int32)
            c = c - (sign_bits << np.int32(7))
            digits.append(c)
    return digits


def _split_tables_balanced(t_int: np.ndarray) -> np.ndarray:
    """Balanced base-128 digit planes [C, W, K] int8 of a signed integer
    table (exact)."""
    mx = int(np.abs(t_int).max())
    chunks = 1
    # greedy balanced digits reach at most 63*128^(c-1) + (128^(c-1)-1)/2
    while 127 * (128 ** (chunks - 1)) // 2 <= mx:
        chunks += 1
    rem = t_int.astype(np.int64).copy()
    planes = np.zeros((chunks,) + t_int.shape, dtype=np.int8)
    for c in range(chunks):
        d = ((rem + 64) % 128) - 64
        planes[c] = d.astype(np.int8)
        rem = (rem - d) // 128
    assert (rem == 0).all()
    return planes


def fp_transforms_default() -> bool:
    """Gate for the exact fixed-point MXU complex transforms: default on
    TPU (they are both faster and fully precise), off on CPU (interpret
    mode is slow; the f64 path is exact there anyway).  MFHE_FP_TRANSFORMS
    overrides."""
    import os

    env = os.environ.get("MFHE_FP_TRANSFORMS", "")
    if env in ("0", "1"):
        return env == "1"
    from ._backend import tpu_kernels_default
    return tpu_kernels_default()


def _fp_cmatmul_kernel(xrl_ref, xrh_ref, xil_ref, xih_ref, tr_ref, ti_ref,
                       ts_ref, o_refs, *, dchunks: int, tchunks: int,
                       bias_bits: int, neg_c_words):
    """out[w, m] = sum_k T[w, k] * X[k, m] (complex), exact over ints.

    Complex products run as 3-multiplication Karatsuba per digit pair —
    P1 = tr*dr, P2 = ti*di, P3 = (tr+ti)*(dr+di); re = P1-P2,
    im = P3-P1-P2 — a 25% MXU cut.  The data-digit sums dr+di stay in
    [-128, 126] (int8-exact) because the digit planes are balanced, and
    the table-digit planes of tr+ti fit the same plane count because
    t_bits is budgeted against max(|tr|, |ti|, |tr+ti|) host-side."""
    dr32 = _balanced_digits(xrl_ref[0], xrh_ref[0], dchunks)
    di32 = _balanced_digits(xil_ref[0], xih_ref[0], dchunks)
    dr = [d.astype(jnp.int8) for d in dr32]
    di = [d.astype(jnp.int8) for d in di32]
    ds = [(a + b).astype(jnp.int8) for a, b in zip(dr32, di32)]

    def dot(t_ref, i, dp):
        return jax.lax.dot_general(t_ref[0, i], dp,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    # complex combination happens per diagonal, immediately, so only the
    # two output diagonal lists stay live (VMEM pressure at K = 512)
    out_re, out_im = [], []
    for s in range(dchunks + tchunks - 1):
        acc_re = acc_im = None
        for i in range(max(0, s - dchunks + 1), min(tchunks, s + 1)):
            j = s - i
            p1 = dot(tr_ref, i, dr[j])
            p2 = dot(ti_ref, i, di[j])
            p3 = dot(ts_ref, i, ds[j])
            pre = p1 - p2
            pim = p3 - p1 - p2
            acc_re = pre if acc_re is None else acc_re + pre
            acc_im = pim if acc_im is None else acc_im + pim
        out_re.append(acc_re)
        out_im.append(acc_im)

    bias = np.int32(1 << bias_bits)
    for part, (m0_ref, m1_ref, m2_ref, sg_ref) in zip(
            (out_re, out_im), o_refs):
        packets = [(CHUNK_BITS * s, (d + bias).astype(U32))
                   for s, d in enumerate(part)]
        parts = [[], [], [], []]
        for shift, v in packets:
            w, r = divmod(shift, 32)
            if r == 0:
                parts[w].append(v)
            else:
                parts[w].append(v << np.uint32(r))
                parts[w + 1].append(v >> np.uint32(32 - r))
        for w, val in enumerate(neg_c_words):
            if val:
                parts[w].append(np.uint32(val))
        w0, w1, w2, w3 = _sum_words(parts, packets[0][1])
        # two's complement mod 2^128 -> sign + magnitude (value < 2^95)
        neg = (w3 >> np.uint32(31))
        n0 = (~w0) + np.uint32(1)
        c = (w0 == 0).astype(U32)           # ~w0 + 1 carries iff w0 == 0
        n1 = (~w1) + c
        c = ((w1 == 0) & (c == 1)).astype(U32)
        n2 = (~w2) + c
        m0_ref[0] = jnp.where(neg == 1, n0, w0)
        m1_ref[0] = jnp.where(neg == 1, n1, w1)
        m2_ref[0] = jnp.where(neg == 1, n2, w2)
        sg_ref[0] = neg


def _kernel_entry(xrl, xrh, xil, xih, tr, ti, ts,
                  r0, r1, r2, r3, i0, i1, i2, i3, **kw):
    _fp_cmatmul_kernel(xrl, xrh, xil, xih, tr, ti, ts,
                       ((r0, r1, r2, r3), (i0, i1, i2, i3)), **kw)


class ExactComplexMatmul:
    """Y = T @ X exact fixed-point complex matmul; T [W, K] complex128
    (host), X [K, M] f64 re/im pair, result f64 pair.

    Accuracy: |err| <= ~2^-37 * max|X| * K-ish per output (input rounding
    at 2^-38 relative of max, table rounding at the per-table scale).
    """

    def __init__(self, t_complex: np.ndarray, m_tile: int | None = None):
        W, K = t_complex.shape
        self.w, self.k = W, K
        # VMEM: tables 2*C*W*K + 4 data [K, TM] + 8 out [W, TM] + ~2 diag
        # sets of (C+C-1) int32 [W, TM] must fit 16 MB
        self.m_tile = m_tile if m_tile is not None else (
            256 if W * K <= 128 * 128 else 128)
        # per-table scale: small-norm tables (e.g. inverse DFTs) get more
        # fractional bits for free within the T_DIGITS balanced-digit range.
        # The Karatsuba kernel also multiplies by tr+ti, so the scale is
        # budgeted against max(|re|, |im|, |re+im|) (<= ~0.5 bit of table
        # precision vs the 4-dot scheme — far inside the 1e-4 contract).
        bound = 127 * (128 ** (T_DIGITS - 1)) // 2
        mx = max(np.abs(t_complex.real).max(), np.abs(t_complex.imag).max(),
                 np.abs(t_complex.real + t_complex.imag).max())
        self.t_bits = int(np.floor(np.log2(bound / max(mx, 1e-300))))
        tr_int = np.round(t_complex.real * (2.0 ** self.t_bits)).astype(np.int64)
        ti_int = np.round(t_complex.imag * (2.0 ** self.t_bits)).astype(np.int64)
        self._tr = jnp.asarray(_split_tables_balanced(tr_int))
        self._ti = jnp.asarray(_split_tables_balanced(ti_int))
        self._ts = jnp.asarray(_split_tables_balanced(tr_int + ti_int))
        self.tchunks = max(self._tr.shape[0], self._ti.shape[0],
                           self._ts.shape[0])

        def _pad(t):
            if t.shape[0] < self.tchunks:
                pad = np.zeros((self.tchunks - t.shape[0], W, K), np.int8)
                return jnp.concatenate([t, jnp.asarray(pad)])
            return t

        self._tr, self._ti, self._ts = map(_pad,
                                           (self._tr, self._ti, self._ts))
        # diagonal magnitude bound: K terms * digit products * overlap; the
        # im part accumulates P3 (data digits doubled) + P1 + P2 -> 4x
        n_diag = DATA_CHUNKS + self.tchunks - 1
        max_diag = K * 64 * 64 * min(DATA_CHUNKS, self.tchunks) * 4
        self.bias_bits = max_diag.bit_length()
        assert (1 << self.bias_bits) + max_diag < (1 << 31)
        c_total = sum((1 << self.bias_bits) << (CHUNK_BITS * s)
                      for s in range(n_diag))
        neg = (1 << 128) - c_total
        self.neg_c = tuple((neg >> (32 * i)) & 0xFFFFFFFF for i in range(4))

    @functools.lru_cache(maxsize=4)
    def _call(self, M: int, TM: int):
        W, K = self.w, self.k
        kern = functools.partial(
            _kernel_entry, dchunks=DATA_CHUNKS, tchunks=self.tchunks,
            bias_bits=self.bias_bits, neg_c_words=self.neg_c)
        data = pl.BlockSpec((1, K, TM), lambda m: (0, 0, m),
                            memory_space=pltpu.VMEM)
        tbl = pl.BlockSpec((1, self.tchunks, W, K),
                           lambda m: (0, 0, 0, 0), memory_space=pltpu.VMEM)
        out = pl.BlockSpec((1, W, TM), lambda m: (0, 0, m),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(M // TM,),
            in_specs=[data, data, data, data, tbl, tbl, tbl],
            out_specs=(out,) * 8,
            out_shape=tuple(jax.ShapeDtypeStruct((1, W, M), jnp.uint32)
                            for _ in range(8)),
            # At W=K=512 the double-buffered blocks + 2x9 diagonal i32
            # planes need ~22 MB of scoped VMEM — over Mosaic's 16 MB
            # default but far under the chip's 128 MB (measured on-chip
            # round 4: the default limit rejects the ref-geometry kernel).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
            interpret=_backend.pallas_interpret_default(),
        )

    @staticmethod
    def _to_pair(v):
        """Signed integer-valued f64 (|v| < 2^50) -> two's-complement u32
        (lo, hi) planes without clamping converts."""
        from .ddfloat import f64_to_u32_exact
        hi_f = jnp.floor(v * np.float64(2.0 ** -32))     # in [-2^18, 2^18)
        lo_f = v - hi_f * np.float64(2.0 ** 32)          # in [0, 2^32)
        hi = jax.lax.bitcast_convert_type(hi_f.astype(jnp.int32), U32)
        return f64_to_u32_exact(lo_f), hi

    def call_words(self, xr: jnp.ndarray, xi: jnp.ndarray):
        """Raw kernel output: ((m0, m1, m2, sign) re, (..) im, e_scale)
        with  true_value = (-1)^sign * (m0 + m1 2^32 + m2 2^64) * 2^-e_scale
        exactly (up to input/table quantization); e_scale is a dynamic
        int32 scalar.  Lets integer consumers (encode quantize) skip the
        f64 reconstruction entirely."""
        K, M = xr.shape
        # dynamic power-of-two scaling to |x_int| <= 2^X_BITS (exact in f64)
        mx = jnp.maximum(jnp.max(jnp.abs(xr)), jnp.max(jnp.abs(xi)))
        mx = jnp.maximum(mx, np.float64(1e-300))
        e_pow = np.float64(X_BITS) - jnp.ceil(jnp.log2(mx))
        s = jnp.exp2(e_pow)
        vr = jnp.round(xr * s)
        vi = jnp.round(xi * s)
        xrl, xrh = self._to_pair(vr)
        xil, xih = self._to_pair(vi)
        TM = min(self.m_tile, M)
        while M % TM:
            TM //= 2
        call = self._call(M, TM)
        with jax.enable_x64(False):
            outs = call(xrl[None], xrh[None], xil[None], xih[None],
                        self._tr[None], self._ti[None], self._ts[None])
        e_scale = e_pow.astype(jnp.int32) + np.int32(self.t_bits)
        words_re = tuple(o[0] for o in outs[:4])
        words_im = tuple(o[0] for o in outs[4:])
        return words_re, words_im, e_scale

    def call_words_w(self, words_re, words_im, e_scale):
        """Chain entry: consume another fp matmul's (words, e_scale) output
        directly — renormalize to <= 2^X_BITS by an exact shift-round (no
        per-element f64 anywhere; the dynamic rescale works off the
        word-plane maxima, scalars).  Returns (words, e') like call_words."""
        from .ddfloat import words_shr_round
        # magnitude ceiling from word maxima (exact scalar f64 math)
        mxs = [jnp.maximum(jnp.max(w[0]).astype(F64)
                           + jnp.max(w[1]).astype(F64) * np.float64(2.0 ** 32)
                           + jnp.max(w[2]).astype(F64) * np.float64(2.0 ** 64),
                           np.float64(1.0))
               for w in (words_re, words_im)]
        mx = jnp.maximum(mxs[0], mxs[1])
        # ceil over the max-of-words bound keeps |rounded| <= 2^X_BITS
        sh = jnp.maximum(jnp.ceil(jnp.log2(mx)).astype(jnp.int32)
                         - np.int32(X_BITS), np.int32(0))

        def renorm(m0, m1, m2, sg):
            lo, hi = words_shr_round(m0, m1, m2, sh)
            # sign-magnitude -> two's complement pair
            nlo = (~lo) + np.uint32(1)
            nhi = (~hi) + (lo == 0).astype(jnp.uint32)
            neg = sg == 1
            return jnp.where(neg, nlo, lo), jnp.where(neg, nhi, hi)

        xrl, xrh = renorm(*words_re)
        xil, xih = renorm(*words_im)
        M = xrl.shape[1]
        TM = min(self.m_tile, M)
        while M % TM:
            TM //= 2
        call = self._call(M, TM)
        with jax.enable_x64(False):
            outs = call(xrl[None], xrh[None], xil[None], xih[None],
                        self._tr[None], self._ti[None], self._ts[None])
        e_out = e_scale - sh + np.int32(self.t_bits)
        return (tuple(o[0] for o in outs[:4]),
                tuple(o[0] for o in outs[4:]), e_out)

    @staticmethod
    def words_to_f64(words, e_scale):
        """Sign-magnitude words + dynamic scale -> f64 (the only f64
        reconstruction left on a words-chained pipeline: the final one)."""
        m0, m1, m2, sg = words
        v = (m0.astype(F64)
             + m1.astype(F64) * np.float64(2.0 ** 32)
             + m2.astype(F64) * np.float64(2.0 ** 64))
        return jnp.where(sg == 1, -v, v) * jnp.exp2(-e_scale.astype(F64))

    def __call__(self, xr: jnp.ndarray, xi: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        words_re, words_im, e_scale = self.call_words(xr, xi)
        return (self.words_to_f64(words_re, e_scale),
                self.words_to_f64(words_im, e_scale))
