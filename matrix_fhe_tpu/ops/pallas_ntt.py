"""Fused Pallas TPU kernels for the modular-matmul transform hot paths.

The XLA-composed path (ops/ntt_large.py, ops/modmatmul.py) materializes every
int8 partial dot in HBM and folds diagonals with emulated-u64 Montgomery
passes; this module fuses one whole modular-matmul *stage* into a single
Mosaic kernel:

    load u32 lo/hi residue planes
      -> 7-bit digit split (VPU shifts)
      -> c^2 int8 x int8 -> int32 digit dots on the MXU
      -> exact 128-bit diagonal accumulation (u32 words, carry counts)
      -> ONE Montgomery REDC per output element (+ optional twiddle montmul)
    store u32 lo/hi planes

Key invariant making the single REDC valid: stage tables are stored in the
Montgomery domain (T*R mod q), so the packed diagonal accumulator equals the
exact integer  S = sum_x D[x] * (T*R mod q)[x] < K * q^2 <= 2^99 < R*q,
i.e. always inside the REDC precondition, and REDC(S) = (D@T mod q) exactly
and canonically.  Twiddled stages then apply one element-wise Montgomery
multiply by (tw * R mod q).

Mosaic has no 64-bit integers: all modular arithmetic here is 32-bit-limb
(16-bit-split wide multiplies), i.e. the Montgomery/Barrett-on-u32-lanes
design the BASELINE north star prescribes.  Wide multiplies are specialized
for q < 2^48 (hi word < 2^16), which covers every modulus in the framework
(<= 45 bits, config.h:20-34 parity).

The four-step driver (PallasFourStepNTT) is transpose-free: stage 1 runs as
a left-matmul on the natural [B, n1, n2] tiles (grid over (limb, batch)) and
stage 2 as a right-matmul over (batch*k1) rows, so the half-GB u64 HBM
transposes of the naive four-step disappear and intermediate data stays as
u32 planes end to end.  Negacyclic psi twists fold into the stage tables.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _backend
from .modmath import MontConsts
from .ntt_large import FourStepPlan, _find_generator

U32 = jnp.uint32
_M16 = np.uint32(0xFFFF)
_S16 = np.uint32(16)
CHUNK_BITS = 7


# ---------------------------------------------------------------------------
# u32-limb wide arithmetic for Mosaic (no i64 on TPU vector units)
# ---------------------------------------------------------------------------

def _wide_mul(a, b):
    """u32 x u32 -> (hi, lo) exact, via 16-bit halves."""
    a0 = a & _M16
    a1 = a >> _S16
    b0 = b & _M16
    b1 = b >> _S16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> _S16) + (lh & _M16) + (hl & _M16)
    lo = (ll & _M16) | (mid << _S16)
    hi = hh + (lh >> _S16) + (hl >> _S16) + (mid >> _S16)
    return hi, lo


def _mul_u32_u16(a, b16):
    """u32 x (u32 < 2^16) -> (hi, lo) exact: product < 2^48."""
    lo_part = (a & _M16) * b16
    hi_part = (a >> _S16) * b16
    lo = lo_part + (hi_part << _S16)
    hi = (hi_part + (lo_part >> _S16)) >> _S16
    return hi, lo


def _mullo64(ah, al, bh, bl):
    """Low 64 bits of a 64x64 product."""
    h0, l0 = _wide_mul(al, bl)
    return h0 + al * bh + ah * bl, l0


def _add64(ah, al, bh, bl):
    l = al + bl
    h = ah + bh + (l < al).astype(U32)
    return h, l


def _sum_words(parts, like):
    """Exact multi-word sum.  parts[i] is a list of u32 addends for 32-bit
    word i; carries are accumulated as u32 *counts* and fed to word i+1
    (a carry count <= len(parts[i]) can never overflow u32)."""
    words = []
    carry = None
    for lst in parts:
        lst = list(lst)
        if carry is not None:
            lst.append(carry)
        if not lst:
            words.append(jnp.zeros_like(like))
            carry = None
            continue
        s = lst[0]
        cc = None
        for v in lst[1:]:
            s2 = s + v
            c = (s2 < v).astype(U32)
            cc = c if cc is None else cc + c
            s = s2
        words.append(s)
        carry = cc
    return words


def _redc(t3, t2, t1, t0, qh, ql, qih, qil):
    """Montgomery reduction of the 4-word t (t < R*q, R = 2^64, q < 2^48):
    returns (hi, lo) = t * R^-1 mod q, canonical (< q)."""
    mh, ml = _mullo64(t1, t0, qih, qil)
    # u = m * q  (q hi word < 2^16)
    h0, l0 = _wide_mul(ml, ql)
    h1, l1 = _mul_u32_u16(ml, qh)
    h2, l2 = _wide_mul(mh, ql)
    h3, l3 = _mul_u32_u16(mh, qh)
    del l0  # u0 = l0 == -t0 mod 2^32 by construction; only the carry matters
    a = h0 + l1
    c1 = (a < l1).astype(U32)
    u1 = a + l2
    c1 = c1 + (u1 < l2).astype(U32)
    del u1  # low 64 bits of t+u vanish; carry-in = (t_lo != 0)
    b = h1 + h2
    c2 = (b < h2).astype(U32)
    b = b + l3
    c2 = c2 + (b < l3).astype(U32)
    u2 = b + c1
    c2 = c2 + (u2 < c1).astype(U32)
    u3 = h3 + c2
    # r = (t + u) >> 64; carry out of the (zero) low 64 bits = (t_lo != 0)
    cin = ((t0 | t1) != 0).astype(U32)
    a = t2 + u2
    ca = (a < u2).astype(U32)
    rl = a + cin
    ca = ca + (rl < cin).astype(U32)
    rh = t3 + u3 + ca
    # r < 2q: one conditional subtract
    ge = (rh > qh) | ((rh == qh) & (rl >= ql))
    borrow = (rl < ql).astype(U32)
    return (jnp.where(ge, rh - qh - borrow, rh),
            jnp.where(ge, rl - ql, rl))


def _montmul48(ah, al, bh, bl, qh, ql, qih, qil):
    """Montgomery a*b*R^-1 mod q for a, b < 2^48 (hi words < 2^16)."""
    h0, t0 = _wide_mul(al, bl)
    h1, l1 = _mul_u32_u16(al, bh)
    h2, l2 = _mul_u32_u16(bl, ah)
    hh = ah * bh  # < 2^32
    a = h0 + l1
    c = (a < l1).astype(U32)
    t1 = a + l2
    c = c + (t1 < l2).astype(U32)
    b = h1 + h2
    b = b + hh
    t2 = b + c  # t < 2^96 exactly => no overflow past word 2
    return _redc(jnp.zeros_like(t2), t2, t1, t0, qh, ql, qih, qil)


def _digit(lo, hi, s):
    """7-bit digit at bit offset s of the (hi, lo) 64-bit value (s static)."""
    m = np.uint32(127)
    if s + CHUNK_BITS <= 32:
        return ((lo >> np.uint32(s)) & m) if s else (lo & m)
    if s >= 32:
        return (hi >> np.uint32(s - 32)) & m
    return ((lo >> np.uint32(s)) | (hi << np.uint32(32 - s))) & m


# ---------------------------------------------------------------------------
# Digit-product schemes: how the c x c digit products that reconstruct the
# 2c-1 product diagonals are computed on the MXU.  Schoolbook needs c^2 dots;
# the subtractive-Karatsuba schemes cut that to 18 (c=5) / 32 (c=7) dots at
# the cost of signed diagonals (handled by bias + exact 128-bit compensation
# in the packer).  `combos` lists the digit linear combinations needed of
# BOTH operands (applied host-side to the tables, in-kernel to the data);
# every dot multiplies combo[i] of the data with combo[i]... pairs given by
# the scheme's `diagonals`.
# ---------------------------------------------------------------------------

def _combo_planes(digits_i32, combos):
    """Apply coefficient vectors to digit planes.  Mosaic has no int8 vector
    arithmetic, so combinations run in int32 and each plane is cast to int8
    only at the end (the MXU dot input type)."""
    out = []
    for vec in combos:
        acc = None
        for c, d in zip(vec, digits_i32):
            if c == 0:
                continue
            term = d if c == 1 else -d
            acc = term if acc is None else acc + term
        out.append(acc.astype(jnp.int8))
    return out


def _ident(chunks):
    return [tuple(1 if i == j else 0 for i in range(chunks))
            for j in range(chunks)]


def _vec(chunks, **kw):
    v = [0] * chunks
    for k, c in kw.items():
        v[int(k[1:])] = c
    return tuple(v)


class _Schoolbook:
    """c^2 dots, non-negative diagonals (unsigned digits)."""

    def __init__(self, chunks):
        self.chunks = chunks
        self.n_dots = chunks * chunks
        self.combos = _ident(chunks)
        self.signed = False

    def diagonals(self, dp, dot):
        n_diag = 2 * self.chunks - 1
        out = []
        for s in range(n_diag):
            diag = None
            for i in range(max(0, s - self.chunks + 1),
                           min(self.chunks, s + 1)):
                p = dot(dp[s - i], i)
                diag = p if diag is None else diag + p
            out.append(diag)
        return out


class _Karatsuba4:
    """4-digit product in 10 dots (vs 16 schoolbook): split 2+2,
    subtractive Karatsuba on both halves, schoolbook on the (A0-A1)
    2-digit middle (whose digit range [-127,127] admits no further
    splitting in int8 — same constraint as _Karatsuba5's middle).  The
    28-bit-modulus grid (ceil(28/7) = 4 digits a side); algebra
    brute-force-verified over the full signed digit range."""

    chunks = 4
    n_dots = 10
    signed = True

    def __init__(self):
        self.combos = _ident(4) + [
            _vec(4, d0=1, d1=-1),            # 4: mA
            _vec(4, d2=1, d3=-1),            # 5: mB
            _vec(4, d0=1, d2=-1),            # 6: u0
            _vec(4, d1=1, d3=-1),            # 7: u1
        ]

    def diagonals(self, dp, dot):
        p00, p11 = dot(dp[0], 0), dot(dp[1], 1)
        p22, p33 = dot(dp[2], 2), dot(dp[3], 3)
        mA, mB = dot(dp[4], 4), dot(dp[5], 5)
        pm = [[dot(dp[6 + i], 6 + j) for j in range(2)] for i in range(2)]
        P0 = [p00, p00 + p11 - mA, p11]
        P2 = [p22, p22 + p33 - mB, p33]
        Pm = [pm[0][0], pm[0][1] + pm[1][0], pm[1][1]]
        M = [P0[i] + P2[i] - Pm[i] for i in range(3)]
        return [P0[0], P0[1], P0[2] + M[0], M[1], M[2] + P2[0],
                P2[1], P2[2]]


class _Karatsuba5:
    """5-digit product in 18 dots: split 2+3, subtractive Karatsuba on both
    halves, schoolbook on the (A0-A1) middle (whose digit range [-127,127]
    admits no further splitting in int8)."""

    chunks = 5
    n_dots = 18
    signed = True

    def __init__(self):
        self.combos = _ident(5) + [
            _vec(5, d0=1, d1=-1),            # 5: mA
            _vec(5, d2=1, d3=-1),            # 6: m23
            _vec(5, d2=1, d4=-1),            # 7: m24
            _vec(5, d3=1, d4=-1),            # 8: m34
            _vec(5, d0=1, d2=-1),            # 9: u0
            _vec(5, d1=1, d3=-1),            # 10: u1
            _vec(5, d4=-1),                  # 11: u2
        ]

    def diagonals(self, dp, dot):
        p00, p11 = dot(dp[0], 0), dot(dp[1], 1)
        p22, p33, p44 = dot(dp[2], 2), dot(dp[3], 3), dot(dp[4], 4)
        mA = dot(dp[5], 5)
        m23, m24, m34 = dot(dp[6], 6), dot(dp[7], 7), dot(dp[8], 8)
        pm = [[dot(dp[9 + i], 9 + j) for j in range(3)] for i in range(3)]
        P0 = [p00, p00 + p11 - mA, p11]
        P2 = [p22, p22 + p33 - m23, p22 + p33 + p44 - m24,
              p33 + p44 - m34, p44]
        Pm = [pm[0][0], pm[0][1] + pm[1][0],
              pm[0][2] + pm[1][1] + pm[2][0],
              pm[1][2] + pm[2][1], pm[2][2]]
        M = [P0[0] + P2[0] - Pm[0], P0[1] + P2[1] - Pm[1],
             P0[2] + P2[2] - Pm[2], P2[3] - Pm[3]]
        return [P0[0], P0[1], P0[2] + M[0], M[1], M[2] + P2[0],
                M[3] + P2[1], P2[2], P2[3], P2[4]]


class _Karatsuba7:
    """7-digit product in 32 dots: split 3+4; 3x3 subtractive on A0B0,
    (2+2)-Karatsuba on A1B1, schoolbook on the 4-digit middle."""

    chunks = 7
    n_dots = 32
    signed = True

    def __init__(self):
        self.combos = _ident(7) + [
            _vec(7, d0=1, d1=-1),            # 7:  c01
            _vec(7, d0=1, d2=-1),            # 8:  c02
            _vec(7, d1=1, d2=-1),            # 9:  c12
            _vec(7, d3=1, d4=-1),            # 10: c34
            _vec(7, d5=1, d6=-1),            # 11: c56
            _vec(7, d3=1, d5=-1),            # 12: e0
            _vec(7, d4=1, d6=-1),            # 13: e1
            _vec(7, d0=1, d3=-1),            # 14: w0
            _vec(7, d1=1, d4=-1),            # 15: w1
            _vec(7, d2=1, d5=-1),            # 16: w2
            _vec(7, d6=-1),                  # 17: w3
        ]

    def diagonals(self, dp, dot):
        p0, p1, p2 = dot(dp[0], 0), dot(dp[1], 1), dot(dp[2], 2)
        m01, m02, m12 = dot(dp[7], 7), dot(dp[8], 8), dot(dp[9], 9)
        P0 = [p0, p0 + p1 - m01, p0 + p1 + p2 - m02, p1 + p2 - m12, p2]
        p3, p4 = dot(dp[3], 3), dot(dp[4], 4)
        m34 = dot(dp[10], 10)
        P0p = [p3, p3 + p4 - m34, p4]
        p5, p6 = dot(dp[5], 5), dot(dp[6], 6)
        m56 = dot(dp[11], 11)
        P2p = [p5, p5 + p6 - m56, p6]
        pmp = [[dot(dp[12 + i], 12 + j) for j in range(2)] for i in range(2)]
        Pmp = [pmp[0][0], pmp[0][1] + pmp[1][0], pmp[1][1]]
        Mp = [P0p[d] + P2p[d] - Pmp[d] for d in range(3)]
        P2 = [P0p[0], P0p[1], P0p[2] + Mp[0], Mp[1],
              Mp[2] + P2p[0], P2p[1], P2p[2]]
        pw = [[dot(dp[14 + i], 14 + j) for j in range(4)] for i in range(4)]
        Pm = [None] * 7
        for d in range(7):
            acc = None
            for i in range(max(0, d - 3), min(4, d + 1)):
                t = pw[i][d - i]
                acc = t if acc is None else acc + t
            Pm[d] = acc
        M = [P0[d] + P2[d] - Pm[d] if d <= 4 else P2[d] - Pm[d]
             for d in range(6)]
        c = [None] * 13
        for s in range(13):
            acc = None
            for term in ([P0[s]] if s <= 4 else []) + \
                        ([M[s - 3]] if 3 <= s <= 8 else []) + \
                        ([P2[s - 6]] if s >= 6 else []):
                acc = term if acc is None else acc + term
            c[s] = acc
        return c


# ---------------------------------------------------------------------------
# The fused stage kernel
# ---------------------------------------------------------------------------

def _mod_matmul_tile(lo, hi, table_planes, qc, *, scheme, bias_bits: int,
                     neg_c_words, side: str, pair_pack: bool, tw=None):
    """One modular-matmul tile: digit-split (lo, hi) canonical residues,
    MXU digit dots against the pre-split table planes (a function idx ->
    int8 plane), exact 128-bit diagonal pack, single REDC, optional twiddle
    montmul.  Returns canonical (hi, lo) u32 planes."""
    import os as _os
    _abl = _os.environ.get("MFHE_PALLAS_ABLATE", "")
    qh, ql, qih, qil = qc
    chunks = scheme.chunks
    n_diag = 2 * chunks - 1

    if _abl == "io":
        return hi, lo
    digits = [_digit(lo, hi, CHUNK_BITS * j).astype(jnp.int32)
              for j in range(chunks)]
    dp = _combo_planes(digits, scheme.combos)
    if _abl == "extract":
        acc = sum(d.astype(jnp.int32) for d in dp).astype(U32)
        return acc, acc

    if side == "right":
        # out[r, k] = sum_x D[r, x] T[k, x]
        def dot(d, i):
            return jax.lax.dot_general(d, table_planes(i),
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.int32)
    else:
        # out[w, m] = sum_r T[w, r] D[r, m]
        def dot(d, i):
            return jax.lax.dot_general(table_planes(i), d,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)

    diags_i32 = scheme.diagonals(dp, dot)
    if _abl == "dots":
        acc = sum(diags_i32).astype(U32)
        return acc, acc
    if scheme.signed:
        bias = np.int32(1 << bias_bits)
        diags = [(d + bias).astype(U32) for d in diags_i32]
    else:
        diags = [d.astype(U32) for d in diags_i32]

    # pack the diagonal values (exact integer S = v * R < R*q) into four
    # u32 words; adjacent diagonals pair into one u32 when the bound allows.
    # For signed schemes every diagonal carries a +2^bias_bits offset that
    # the precomputed 128-bit complement constant cancels exactly (mod 2^128)
    # inside the same carry-counted word sum.
    if pair_pack:
        packets = [(14 * t, diags[2 * t] + (diags[2 * t + 1]
                                            << np.uint32(CHUNK_BITS)))
                   for t in range(n_diag // 2)]
        if n_diag % 2:
            packets.append((14 * (n_diag // 2), diags[-1]))
    else:
        packets = [(CHUNK_BITS * s, d) for s, d in enumerate(diags)]
    parts = [[], [], [], []]
    for shift, v in packets:
        w, r = divmod(shift, 32)
        if r == 0:
            parts[w].append(v)
        else:
            parts[w].append(v << np.uint32(r))
            parts[w + 1].append(v >> np.uint32(32 - r))
    if neg_c_words is not None:
        for w, val in enumerate(neg_c_words):
            if val:
                parts[w].append(np.uint32(val))
    t0, t1, t2, t3 = _sum_words(parts, diags[0])
    if _abl == "pack":
        return t3 ^ t1, t2 ^ t0

    rh, rl = _redc(t3, t2, t1, t0, qh, ql, qih, qil)
    if tw is not None and _abl != "notw":
        twh, twl = tw
        rh, rl = _montmul48(rh, rl, twh, twl, qh, ql, qih, qil)
    return rh, rl


def _stage_kernel(dlo_ref, dhi_ref, tch_ref, twlo_ref, twhi_ref,
                  sc_ref, olo_ref, ohi_ref,
                  *, scheme, bias_bits: int, neg_c_words, with_twiddle: bool,
                  side: str, pair_pack: bool, lead: int):
    qc = (sc_ref[0, 0, 1], sc_ref[0, 0, 0], sc_ref[0, 0, 3], sc_ref[0, 0, 2])
    idx = (0,) * lead
    tw = (twhi_ref[idx], twlo_ref[idx]) if with_twiddle else None
    rh, rl = _mod_matmul_tile(
        dlo_ref[idx], dhi_ref[idx], lambda i: tch_ref[0, i], qc,
        scheme=scheme, bias_bits=bias_bits, neg_c_words=neg_c_words,
        side=side, pair_pack=pair_pack, tw=tw)
    olo_ref[idx] = rl
    ohi_ref[idx] = rh


def _fused_ntt_kernel(dlo_ref, dhi_ref, tA_ref, tB_ref, twlo_ref, twhi_ref,
                      sc_ref, olo_ref, ohi_ref,
                      *, scheme, bias_bits: int, neg_c_words, pair_pack: bool,
                      sides: Tuple[str, str], bb: int = 1):
    """Both four-step stages on one [n1, n2] tile: stage A (with the
    inter-stage twiddle folded onto its output) immediately feeds stage B —
    the intermediate spectrum never leaves VMEM.  `bb` batch entries share
    one grid cell to amortize per-cell DMA/grid overheads."""
    qc = (sc_ref[0, 0, 1], sc_ref[0, 0, 0], sc_ref[0, 0, 3], sc_ref[0, 0, 2])
    tw = (twhi_ref[0, 0], twlo_ref[0, 0])
    kw = dict(scheme=scheme, bias_bits=bias_bits, neg_c_words=neg_c_words,
              pair_pack=pair_pack)
    for j in range(bb):
        h, l = _mod_matmul_tile(dlo_ref[0, j], dhi_ref[0, j],
                                lambda i: tA_ref[0, i], qc,
                                side=sides[0], tw=tw, **kw)
        rh, rl = _mod_matmul_tile(l, h, lambda i: tB_ref[0, i], qc,
                                  side=sides[1], tw=None, **kw)
        olo_ref[0, j] = rl
        ohi_ref[0, j] = rh


def _ntt_mul_ntt_kernel(dlo_ref, dhi_ref, slo_ref, shi_ref, tf_ref, ti_ref,
                        sc_ref, olo_ref, ohi_ref,
                        *, scheme, bias_bits: int, neg_c_words,
                        pair_pack: bool, rep: int):
    """iNTT_X(NTT_X(a) * s) on one row tile, all in VMEM: the X-NTT
    pointwise-multiply round trip of encrypt/decrypt (pointwise_mul_s_kernel
    + xy_ntt_forward/backward, HE.cu:509-531,1509-1526) as ONE kernel.
    s is Montgomery-domain, one row per w (replicated x`rep` to data rows).
    """
    qc = (sc_ref[0, 0, 1], sc_ref[0, 0, 0], sc_ref[0, 0, 3], sc_ref[0, 0, 2])
    kw = dict(scheme=scheme, bias_bits=bias_bits, neg_c_words=neg_c_words,
              pair_pack=pair_pack, side="right", tw=None)
    vh, vl = _mod_matmul_tile(dlo_ref[0], dhi_ref[0],
                              lambda i: tf_ref[0, i], qc, **kw)
    sl = slo_ref[0]
    sh = shi_ref[0]
    if rep > 1:
        tw_rows, k = sl.shape
        sl = jnp.broadcast_to(sl[:, None, :], (tw_rows, rep, k)
                              ).reshape(tw_rows * rep, k)
        sh = jnp.broadcast_to(sh[:, None, :], (tw_rows, rep, k)
                              ).reshape(tw_rows * rep, k)
    th, tl = _montmul48(vh, vl, sh, sl, *qc)
    rh, rl = _mod_matmul_tile(tl, th, lambda i: ti_ref[0, i], qc, **kw)
    olo_ref[0] = rl
    ohi_ref[0] = rh


def _mul_ntt_tile(rows: int, rep: int, row_tile: int) -> int:
    """Row tile for the fused mul-NTT kernels.

    Mosaic requires a block's second-to-last dim to be divisible by 8 or
    equal the full array dim; the s operand's block is tile//rep rows, so
    the tile must keep tw = tile//rep a multiple of 8 (or span all of s).
    The ring="gl" geometry (rep=32, row_tile 256 -> tw=8) met this by
    accident; ring="gl2" (rep=64 -> tw=4) did not and failed to lower on
    real TPU (round-5 on-chip runbook, examples/matmul_gl2.py mid)."""
    s_rows = rows // rep
    best = None
    for tw in range(8, s_rows + 1, 8):
        t = tw * rep
        if rows % t == 0 and t <= row_tile:
            best = t
    if best is None:
        for tw in range(8, s_rows, 8):
            if rows % (tw * rep) == 0:
                best = tw * rep          # smallest compliant tile > row_tile
                break
    return best if best is not None else rows  # tw == s_rows: full blocks


class PallasNttMulNtt:
    """Fused t = iNTT_X(NTT_X(a) * s) over [L, R, K] row-major data (K the
    X axis, possibly lane-packed by the caller); s [L, W, K] with
    R = W * rep."""

    def __init__(self, fwd_tables: np.ndarray, inv_tables: np.ndarray,
                 moduli, rep: int, row_tile: int = 256):
        L, W, K = fwd_tables.shape
        assert W == K and inv_tables.shape == fwd_tables.shape
        self.L, self.k = L, K
        self.rep = rep
        self.row_tile = max(rep, row_tile // rep * rep)
        bits = max(int(q).bit_length() for q in moduli)
        (self.scheme, self.bias_bits, self.neg_c_words,
         self.pair_pack) = _plan_scheme(K, bits)
        self._tf = jnp.asarray(_split_tables(fwd_tables, moduli,
                                             self.scheme.combos))
        self._ti = jnp.asarray(_split_tables(inv_tables, moduli,
                                             self.scheme.combos))
        self._sc = jnp.asarray(_mont_consts_u32(moduli))

    @functools.lru_cache(maxsize=8)
    def _call(self, rows: int, tile: int):
        L, K = self.L, self.k
        n_planes = len(self.scheme.combos)
        kern = functools.partial(
            _ntt_mul_ntt_kernel, scheme=self.scheme, bias_bits=self.bias_bits,
            neg_c_words=self.neg_c_words, pair_pack=self.pair_pack,
            rep=self.rep)
        nt = rows // tile
        tw = tile // self.rep
        data_spec = pl.BlockSpec((1, tile, K), lambda l, r: (l, r, 0),
                                 memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, tw, K), lambda l, r: (l, r, 0),
                              memory_space=pltpu.VMEM)
        tbl_spec = pl.BlockSpec((1, n_planes, K, K), lambda l, r: (l, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 4), lambda l, r: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kern,
            grid=(L, nt),
            in_specs=[data_spec, data_spec, s_spec, s_spec,
                      tbl_spec, tbl_spec, sc_spec],
            out_specs=(data_spec, data_spec),
            out_shape=(jax.ShapeDtypeStruct((L, rows, K), jnp.uint32),
                       jax.ShapeDtypeStruct((L, rows, K), jnp.uint32)),
            interpret=_backend.pallas_interpret_default(),
        )

    def __call__(self, d_lo, d_hi, s_lo, s_hi):
        rows = d_lo.shape[1]
        if rows % self.rep:
            raise ValueError(f"rows {rows} not a multiple of rep {self.rep}")
        tile = _mul_ntt_tile(rows, self.rep, self.row_tile)
        call = self._call(rows, tile)
        with jax.enable_x64(False):
            return call(d_lo, d_hi, s_lo, s_hi, self._tf, self._ti, self._sc)


def _mod_dots_pack(lo, hi, table_planes, *, scheme, bias_bits, neg_c_words,
                   pair_pack, side):
    """Digit extraction + scheme dots + 128-bit pack, returning the four
    packed accumulator words (the REDC/twiddle half is deferred — used by
    the software-pipelined kernel to split MXU-heavy and VPU-heavy work
    across grid steps)."""
    chunks = scheme.chunks
    n_diag = 2 * chunks - 1
    digits = [_digit(lo, hi, CHUNK_BITS * j).astype(jnp.int32)
              for j in range(chunks)]
    dp = _combo_planes(digits, scheme.combos)
    if side == "right":
        def dot(d, i):
            return jax.lax.dot_general(d, table_planes(i),
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.int32)
    else:
        def dot(d, i):
            return jax.lax.dot_general(table_planes(i), d,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
    diags_i32 = scheme.diagonals(dp, dot)
    if scheme.signed:
        bias = np.int32(1 << bias_bits)
        diags = [(d + bias).astype(U32) for d in diags_i32]
    else:
        diags = [d.astype(U32) for d in diags_i32]
    if pair_pack:
        packets = [(14 * t, diags[2 * t] + (diags[2 * t + 1]
                                            << np.uint32(CHUNK_BITS)))
                   for t in range(n_diag // 2)]
        if n_diag % 2:
            packets.append((14 * (n_diag // 2), diags[-1]))
    else:
        packets = [(CHUNK_BITS * s, d) for s, d in enumerate(diags)]
    parts = [[], [], [], []]
    for shift, v in packets:
        w, r = divmod(shift, 32)
        if r == 0:
            parts[w].append(v)
        else:
            parts[w].append(v << np.uint32(r))
            parts[w + 1].append(v >> np.uint32(32 - r))
    if neg_c_words is not None:
        for w, val in enumerate(neg_c_words):
            if val:
                parts[w].append(np.uint32(val))
    return _sum_words(parts, diags[0])


def _pipelined_ntt_kernel(dlo_ref, dhi_ref, tA_ref, tB_ref, twlo_ref,
                          twhi_ref, sc_ref, olo_ref, ohi_ref,
                          scrA_ref, scrB_ref,
                          *, scheme, bias_bits: int, neg_c_words,
                          pair_pack: bool, sides: Tuple[str, str], B: int):
    """Software-pipelined fused four-step NTT: grid (L, B+2); step s runs
    stage-A dots+pack for tile s, stage-A REDC + twiddle + stage-B dots+pack
    for tile s-1, and stage-B REDC + store for tile s-2 — so tile i's
    MXU-heavy dots and tile i±1's VPU-heavy folds are independent work in
    the same body, giving Mosaic's scheduler room to overlap the units.

    MEASURED (round 1, v5e): bit-exact but NEUTRAL vs the plain fused
    kernel (17.9 vs 17.3 ms per B=64 forward) — Mosaic executes the
    pl.when phases sequentially rather than co-scheduling MXU and VPU
    streams.  Kept behind MFHE_NTT_PIPELINED=1 as a building block /
    record; revisit if Mosaic gains cross-branch scheduling."""
    s = pl.program_id(1)
    qc = (sc_ref[0, 0, 1], sc_ref[0, 0, 0], sc_ref[0, 0, 3], sc_ref[0, 0, 2])
    qh, ql, qih, qil = qc
    kw = dict(scheme=scheme, bias_bits=bias_bits, neg_c_words=neg_c_words,
              pair_pack=pair_pack)

    @pl.when(s < B)
    def _phase_a():
        t0, t1, t2, t3 = _mod_dots_pack(dlo_ref[0, 0], dhi_ref[0, 0],
                                        lambda i: tA_ref[0, i],
                                        side=sides[0], **kw)
        slot = jax.lax.rem(s, 2)
        scrA_ref[slot, 0] = t0
        scrA_ref[slot, 1] = t1
        scrA_ref[slot, 2] = t2
        scrA_ref[slot, 3] = t3

    @pl.when((s >= 1) & (s <= B))
    def _phase_b():
        slot = jax.lax.rem(s - 1, 2)
        vh, vl = _redc(scrA_ref[slot, 3], scrA_ref[slot, 2],
                       scrA_ref[slot, 1], scrA_ref[slot, 0],
                       qh, ql, qih, qil)
        vh, vl = _montmul48(vh, vl, twhi_ref[0, 0], twlo_ref[0, 0],
                            qh, ql, qih, qil)
        u0, u1, u2, u3 = _mod_dots_pack(vl, vh, lambda i: tB_ref[0, i],
                                        side=sides[1], **kw)
        scrB_ref[slot, 0] = u0
        scrB_ref[slot, 1] = u1
        scrB_ref[slot, 2] = u2
        scrB_ref[slot, 3] = u3

    @pl.when(s >= 2)
    def _phase_c():
        slot = jax.lax.rem(s - 2, 2)
        rh, rl = _redc(scrB_ref[slot, 3], scrB_ref[slot, 2],
                       scrB_ref[slot, 1], scrB_ref[slot, 0],
                       qh, ql, qih, qil)
        olo_ref[0, 0] = rl
        ohi_ref[0, 0] = rh


def _plan_scheme(K: int, bits: int):
    """Pick the digit-product scheme and packer constants for a modular
    matmul with contraction length K over `bits`-wide moduli."""
    import os

    chunks = -(-bits // CHUNK_BITS)
    n_diag = 2 * chunks - 1
    # Karatsuba's in-kernel combo planes (i32 until the int8 cast) cost
    # ~len(combos) * K * tile * 4 bytes of scoped VMEM; at K = 512 that
    # blows the 16 MB budget, so it is gated to K <= 256 contractions.
    no_kara = os.environ.get("MFHE_NO_KARATSUBA", "") == "1" or K > 256
    if chunks == 4 and not no_kara:
        scheme = _Karatsuba4()
    elif chunks == 5 and not no_kara:
        scheme = _Karatsuba5()
    elif chunks == 7 and not no_kara:
        scheme = _Karatsuba7()
    else:
        scheme = _Schoolbook(chunks)
    if scheme.signed:
        bias_bits = (20 * K * 127 * 127).bit_length()
        bias = 1 << bias_bits
        assert bias + 20 * K * 127 * 127 < (1 << 31)
        c_total = sum(bias << (CHUNK_BITS * s) for s in range(n_diag))
        neg = (1 << 128) - c_total
        neg_c_words = tuple((neg >> (32 * i)) & 0xFFFFFFFF for i in range(4))
        pair_pack = False
    else:
        bias_bits = 0
        neg_c_words = None
        max_diag = K * (127 ** 2) * chunks
        pair_pack = max_diag * ((1 << CHUNK_BITS) + 1) < (1 << 32)
    return scheme, bias_bits, neg_c_words, pair_pack


def _split_tables(tables_u64: np.ndarray, moduli, combos) -> np.ndarray:
    """Montgomery-domain digit combo planes [L, n_combos, W, K] int8."""
    L, W, K = tables_u64.shape
    chunks = len(combos[0])
    tmont = np.empty_like(tables_u64)
    for l, q in enumerate(moduli):
        q = int(q)
        r_mod = (1 << 64) % q
        tmont[l] = (tables_u64[l].astype(object) * r_mod % q
                    ).astype(np.uint64)
    tdig = np.empty((L, chunks, W, K), dtype=np.int16)
    for c in range(chunks):
        tdig[:, c] = ((tmont >> np.uint64(CHUNK_BITS * c))
                      & np.uint64(127)).astype(np.int16)
    tch = np.zeros((L, len(combos), W, K), dtype=np.int16)
    for i, vec in enumerate(combos):
        for c, coef in enumerate(vec):
            if coef:
                tch[:, i] += coef * tdig[:, c]
    assert np.abs(tch).max() <= 127
    return tch.astype(np.int8)


def _mont_consts_u32(moduli) -> np.ndarray:
    sc = np.empty((len(moduli), 4), dtype=np.uint32)
    for l, q in enumerate(moduli):
        mc = MontConsts.make(int(q))
        sc[l] = (q & 0xFFFFFFFF, q >> 32,
                 mc.qinv_neg & 0xFFFFFFFF, mc.qinv_neg >> 32)
    return sc.reshape(len(moduli), 1, 4)


class PallasStage:
    """One fused modular-matmul stage over a run of same-width moduli.

    side='right': out[l, r, k] = sum_x D[l, r, x] T[l, k, x] mod q, tiled over
                  rows r; optional per-(r mod tw_rows, k) twiddle (NTT stages).
    side='left':  out[l, w, m] = sum_r T[l, w, r] D[l, r, m] mod q, tiled over
                  columns m (the W-CRT transform orientation, HE.cu:716-781).
    side='batched_left': D is [l, b, K, M]; grid over (l, b, m-tiles);
                  optional per-(w, m) twiddle (the four-step stage-1 shape).

    Tables are stored digit-split in the Montgomery domain; twiddle_mont (if
    given) is tw * R mod q.
    """

    def __init__(self, tables_u64: np.ndarray, moduli,
                 twiddle_mont: Optional[np.ndarray] = None,
                 row_tile: int = 256, side: str = "right"):
        L, W, K = tables_u64.shape
        assert side in ("right", "left", "batched_left")
        if side == "left":
            assert twiddle_mont is None, "twiddle unsupported on plain 'left'"
        elif side == "right":
            assert W == K
        self.side = side
        self.L, self.k = L, K
        self.w = W
        self.row_tile = row_tile
        bits = max(int(q).bit_length() for q in moduli)
        assert bits < 48, "moduli must be < 2^48 for the specialized REDC"
        self.chunks = -(-bits // CHUNK_BITS)
        # packed integer is exactly sum_x D[x]*(T*R mod q)[x] < K * q^2;
        # REDC needs < R*q = q * 2^64
        assert K < (1 << 64) // (1 << bits), "K*q^2 exceeds the REDC domain"

        (self.scheme, self.bias_bits, self.neg_c_words,
         self.pair_pack) = _plan_scheme(K, bits)
        self._tch = jnp.asarray(
            _split_tables(tables_u64, moduli, self.scheme.combos))
        self._sc = jnp.asarray(_mont_consts_u32(moduli))

        self.with_twiddle = twiddle_mont is not None
        if self.with_twiddle:
            self.tw_rows = twiddle_mont.shape[1]
            self._twlo = jnp.asarray(
                (twiddle_mont & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            self._twhi = jnp.asarray(
                (twiddle_mont >> np.uint64(32)).astype(np.uint32))
        else:
            self.tw_rows = 0
            self._twlo = jnp.zeros((L, 1, 1), jnp.uint32)
            self._twhi = jnp.zeros((L, 1, 1), jnp.uint32)

    @functools.lru_cache(maxsize=16)
    def _call(self, batch: int, rows: int, tile: int):
        """batch: leading grid axis (batched_left only); rows: tiled extent
        (R for 'right', M for 'left'/'batched_left'); tile: its tile."""
        L, K = self.L, self.k
        batched = self.side == "batched_left"
        lead = 2 if batched else 1
        n_planes = len(self.scheme.combos)
        kern = functools.partial(
            _stage_kernel, scheme=self.scheme, bias_bits=self.bias_bits,
            neg_c_words=self.neg_c_words, with_twiddle=self.with_twiddle,
            side="right" if self.side == "right" else "left",
            pair_pack=self.pair_pack, lead=lead)
        assert rows % tile == 0
        nt = rows // tile
        tw_placeholder = pl.BlockSpec((1,) * (lead + 2), lambda *a: (0,) * (lead + 2),
                                      memory_space=pltpu.VMEM)
        if self.side == "right":
            grid = (L, nt)
            tch_spec = pl.BlockSpec((1, n_planes, self.w, K),
                                    lambda l, r: (l, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
            sc_spec = pl.BlockSpec((1, 1, 4), lambda l, r: (l, 0, 0),
                                   memory_space=pltpu.SMEM)
            data_spec = pl.BlockSpec((1, tile, K), lambda l, r: (l, r, 0),
                                     memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((1, tile, self.w), lambda l, r: (l, r, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = (L, rows, self.w)
            if self.with_twiddle:
                assert self.tw_rows % tile == 0
                tiles_per_tw = self.tw_rows // tile
                tw_spec = pl.BlockSpec(
                    (1, tile, self.w),
                    lambda l, r: (l, r % tiles_per_tw, 0),
                    memory_space=pltpu.VMEM)
            else:
                tw_spec = tw_placeholder
        elif self.side == "left":
            grid = (L, nt)
            tch_spec = pl.BlockSpec((1, n_planes, self.w, K),
                                    lambda l, m: (l, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
            sc_spec = pl.BlockSpec((1, 1, 4), lambda l, m: (l, 0, 0),
                                   memory_space=pltpu.SMEM)
            data_spec = pl.BlockSpec((1, K, tile), lambda l, m: (l, 0, m),
                                     memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((1, self.w, tile), lambda l, m: (l, 0, m),
                                    memory_space=pltpu.VMEM)
            out_shape = (L, self.w, rows)
            tw_spec = tw_placeholder
        else:  # batched_left
            grid = (L, batch, nt)
            tch_spec = pl.BlockSpec((1, n_planes, self.w, K),
                                    lambda l, b, m: (l, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
            sc_spec = pl.BlockSpec((1, 1, 4), lambda l, b, m: (l, 0, 0),
                                   memory_space=pltpu.SMEM)
            data_spec = pl.BlockSpec((1, 1, K, tile),
                                     lambda l, b, m: (l, b, 0, m),
                                     memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((1, 1, self.w, tile),
                                    lambda l, b, m: (l, b, 0, m),
                                    memory_space=pltpu.VMEM)
            out_shape = (L, batch, self.w, rows)
            if self.with_twiddle:
                tw_spec = pl.BlockSpec((1, 1, self.w, tile),
                                       lambda l, b, m: (l, 0, 0, m),
                                       memory_space=pltpu.VMEM)
            else:
                tw_spec = tw_placeholder
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[data_spec, data_spec, tch_spec, tw_spec, tw_spec,
                      sc_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct(out_shape, jnp.uint32),
                       jax.ShapeDtypeStruct(out_shape, jnp.uint32)),
            interpret=_backend.pallas_interpret_default(),
        )

    def __call__(self, d_lo: jnp.ndarray, d_hi: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """side='right': d [L, R, K] u32, tiled over R.
        side='left':  d [L, K, M] u32, tiled over M.
        side='batched_left': d [L, B, K, M] u32, grid over (B, M-tiles)."""
        if self.side == "right":
            batch, rows = 0, d_lo.shape[1]
        elif self.side == "left":
            batch, rows = 0, d_lo.shape[2]
        else:
            batch, rows = d_lo.shape[1], d_lo.shape[3]
        tile = min(self.row_tile, rows)
        while rows % tile:
            tile //= 2
        call = self._call(batch, rows, tile)
        twl, twh = self._twlo, self._twhi
        if self.side == "batched_left":
            twl = twl.reshape((self.L, 1) + twl.shape[1:])
            twh = twh.reshape((self.L, 1) + twh.shape[1:])
        # Mosaic cannot legalize the i64 index/return types that
        # jax_enable_x64 injects into gridded pallas_calls; trace the kernel
        # in 32-bit mode (all operands are explicitly u32/int8 anyway).
        with jax.enable_x64(False):
            return call(d_lo, d_hi, self._tch, twl, twh, self._sc)


def split_u64(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return ((x & np.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (x >> np.uint64(32)).astype(jnp.uint32))


def join_u64(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))


class PallasFourStepNTT:
    """Transpose-free four-step negacyclic NTT with both stages as fused
    Pallas kernels; twists folded into the tables.  Output order and values
    are bit-identical to ops.ntt_large.FourStepNTT.

    forward:  x[i1*n2+i2] --s1(left, per (l,b))--> [k1, i2] (* w^(i2 k1) psi^(i2))
              --s2(right, rows (b,k1))--> [k1, k2]
    inverse mirrors it.  No HBM transposes; data stays u32 lo/hi planes
    between the stages (use forward_pair/inverse_pair to avoid the u64
    split/join at the edges too)."""

    def __init__(self, plan: FourStepPlan, row_tile: int = 256):
        if plan.n1 != plan.n2:
            raise ValueError("PallasFourStepNTT requires n1 == n2")
        self.plan = plan
        n, n1, n2 = plan.n, plan.n1, plan.n2
        t1f, t2f, t1i, t2i, twf, twi = _four_step_tables(plan)
        L = len(plan.moduli)
        for l, q in enumerate(plan.moduli):
            r_mod = (1 << 64) % q
            twf[l] = (twf[l].astype(object) * r_mod % q).astype(np.uint64)
            twi[l] = (twi[l].astype(object) * r_mod % q).astype(np.uint64)
        mods = plan.moduli
        bits = max(int(q).bit_length() for q in mods)
        (self._scheme, self._bias_bits, self._negc,
         self._pp) = _plan_scheme(n1, bits)
        combos = self._scheme.combos
        self._t1f = jnp.asarray(_split_tables(t1f, mods, combos))
        self._t2f = jnp.asarray(_split_tables(t2f, mods, combos))
        self._t1i = jnp.asarray(_split_tables(t1i, mods, combos))
        self._t2i = jnp.asarray(_split_tables(t2i, mods, combos))
        self._twf = (jnp.asarray((twf >> np.uint64(32)).astype(np.uint32)),
                     jnp.asarray((twf & np.uint64(0xFFFFFFFF))
                                 .astype(np.uint32)))
        self._twi = (jnp.asarray((twi >> np.uint64(32)).astype(np.uint32)),
                     jnp.asarray((twi & np.uint64(0xFFFFFFFF))
                                 .astype(np.uint32)))
        self._sc = jnp.asarray(_mont_consts_u32(mods))
        self.L = len(mods)

    @functools.lru_cache(maxsize=8)
    def _fused_call(self, B: int, direction: str):
        import os

        p = self.plan
        L, n1, n2 = self.L, p.n1, p.n2
        n_planes = len(self._scheme.combos)
        sides = ("left", "right") if direction == "fwd" else ("right", "left")
        bb = int(os.environ.get("MFHE_NTT_BB", "1"))
        while B % bb:
            bb //= 2
        kern = functools.partial(
            _fused_ntt_kernel, scheme=self._scheme, bias_bits=self._bias_bits,
            neg_c_words=self._negc, pair_pack=self._pp, sides=sides, bb=bb)
        data_spec = pl.BlockSpec((1, bb, n1, n2), lambda l, b: (l, b, 0, 0),
                                 memory_space=pltpu.VMEM)
        tbl_spec = pl.BlockSpec((1, n_planes, n1, n1),
                                lambda l, b: (l, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        tw_spec = pl.BlockSpec((1, 1, n1, n2), lambda l, b: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 4), lambda l, b: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kern,
            grid=(L, B // bb),
            in_specs=[data_spec, data_spec, tbl_spec, tbl_spec,
                      tw_spec, tw_spec, sc_spec],
            out_specs=(data_spec, data_spec),
            out_shape=(jax.ShapeDtypeStruct((L, B, n1, n2), jnp.uint32),
                       jax.ShapeDtypeStruct((L, B, n1, n2), jnp.uint32)),
            interpret=_backend.pallas_interpret_default(),
        )

    @functools.lru_cache(maxsize=8)
    def _pipelined_call(self, B: int, direction: str):
        p = self.plan
        L, n1, n2 = self.L, p.n1, p.n2
        n_planes = len(self._scheme.combos)
        sides = ("left", "right") if direction == "fwd" else ("right", "left")
        kern = functools.partial(
            _pipelined_ntt_kernel, scheme=self._scheme,
            bias_bits=self._bias_bits, neg_c_words=self._negc,
            pair_pack=self._pp, sides=sides, B=B)
        data_spec = pl.BlockSpec(
            (1, 1, n1, n2),
            lambda l, s: (l, jnp.minimum(s, B - 1), 0, 0),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(
            (1, 1, n1, n2),
            lambda l, s: (l, jnp.maximum(s - 2, 0), 0, 0),
            memory_space=pltpu.VMEM)
        tbl_spec = pl.BlockSpec((1, n_planes, n1, n1),
                                lambda l, s: (l, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        tw_spec = pl.BlockSpec((1, 1, n1, n2), lambda l, s: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 4), lambda l, s: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kern,
            grid=(L, B + 2),
            in_specs=[data_spec, data_spec, tbl_spec, tbl_spec,
                      tw_spec, tw_spec, sc_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((L, B, n1, n2), jnp.uint32),
                       jax.ShapeDtypeStruct((L, B, n1, n2), jnp.uint32)),
            scratch_shapes=[pltpu.VMEM((2, 4, n1, n2), jnp.uint32),
                            pltpu.VMEM((2, 4, n1, n2), jnp.uint32)],
            interpret=_backend.pallas_interpret_default(),
        )

    def _run(self, lo, hi, direction):
        import os

        p = self.plan
        L, B = lo.shape[0], lo.shape[1]
        lo4 = lo.reshape(L, B, p.n1, p.n2)
        hi4 = hi.reshape(L, B, p.n1, p.n2)
        if direction == "fwd":
            tA, tB = self._t1f, self._t2f
            twh, twl = self._twf
        else:
            tA, tB = self._t2i, self._t1i
            twh, twl = self._twi
        if os.environ.get("MFHE_NTT_PIPELINED", "") == "1":
            call = self._pipelined_call(B, direction)
        else:
            call = self._fused_call(B, direction)
        twl4 = twl.reshape(L, 1, p.n1, p.n2)
        twh4 = twh.reshape(L, 1, p.n1, p.n2)
        with jax.enable_x64(False):
            olo, ohi = call(lo4, hi4, tA, tB, twl4, twh4, self._sc)
        return olo.reshape(L, B, p.n), ohi.reshape(L, B, p.n)

    def forward_pair(self, lo: jnp.ndarray, hi: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[L, B, N] u32 lo/hi planes -> four-step-order spectrum planes.
        Both stages run inside ONE fused kernel per (limb, batch) tile."""
        return self._run(lo, hi, "fwd")

    def inverse_pair(self, lo: jnp.ndarray, hi: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._run(lo, hi, "inv")

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """[L, B, N] u64 -> four-step-order spectrum (u64 wrapper)."""
        return join_u64(*self.forward_pair(*split_u64(x)))

    def inverse(self, xf: jnp.ndarray) -> jnp.ndarray:
        return join_u64(*self.inverse_pair(*split_u64(xf)))


def _four_step_tables(plan: FourStepPlan):
    """Plain-domain (non-Montgomery) four-step stage tables + twiddles.

    t1f [k1, i1] * psi^(i1 n2)  (stage-1 forward, left matmul)
    t2f [k2, i2]                (stage-2 forward, right matmul)
    t1i/t2i mirror for the inverse (1/n and psi^-1 folded into t1i)
    twf/twi [k1, i2]: inter-stage twiddle w_N^(i2 k1) * psi^(+-i2)
    """
    n, n1, n2 = plan.n, plan.n1, plan.n2
    L = len(plan.moduli)
    t1f = np.empty((L, n1, n1), dtype=np.uint64)
    t2f = np.empty((L, n2, n2), dtype=np.uint64)
    t1i = np.empty((L, n1, n1), dtype=np.uint64)
    t2i = np.empty((L, n2, n2), dtype=np.uint64)
    twf = np.empty((L, n1, n2), dtype=np.uint64)
    twi = np.empty((L, n1, n2), dtype=np.uint64)
    for l, q in enumerate(plan.moduli):
        g = _find_generator(q)
        w_n = pow(g, (q - 1) // n, q)
        w1 = pow(w_n, n2, q)
        n_inv = pow(n, q - 2, q)
        if plan.negacyclic:
            psi = pow(g, (q - 1) // (2 * n), q)
            psi_inv = pow(psi, q - 2, q)
        else:
            psi = psi_inv = 1
        for a in range(n1):
            pa = pow(psi, a * n2 % (2 * n), q)
            pai = pow(psi_inv, a * n2 % (2 * n), q)
            for b in range(n1):
                t1f[l, b, a] = pow(w1, a * b % n1, q) * pa % q
                t1i[l, a, b] = pow(w1, (-a * b) % n1, q) * n_inv % q * pai % q
        for a in range(n2):
            for b in range(n2):
                t2f[l, a, b] = pow(w1, a * b % n2, q)
                t2i[l, a, b] = pow(w1, (-a * b) % n2, q)
        w_inv = pow(w_n, q - 2, q)
        for i2 in range(n2):
            p2 = pow(psi, i2, q)
            p2i = pow(psi_inv, i2, q)
            for k1 in range(n1):
                twf[l, k1, i2] = pow(w_n, i2 * k1 % n, q) * p2 % q
                twi[l, k1, i2] = pow(w_inv, i2 * k1 % n, q) * p2i % q
    return t1f, t2f, t1i, t2i, twf, twi


# ---------------------------------------------------------------------------
# Sliced-table fold: the round-2 fused-kernel redesign.
#
# Round-1 ablation + a VPU microbenchmark (scripts/micro_vpu.py) showed the
# fused kernel above is bound by per-element VPU work (~400 weighted i32 ops:
# signed-diagonal bias, 9..13-diagonal 128-bit carry-counted pack, 64-bit
# REDC, Montgomery twiddle), not by the MXU dots.  This design cuts that ~3x:
#
#  * per-digit pre-reduced tables  T_j = T * 2^(28+7j) mod q  turn the digit
#    "diagonal" structure into a plain sum over the TABLE digit index only:
#    the data-digit index j merges into the MXU contraction (digit planes
#    concatenated along the K axis), so diagonals = chunks_t planes, all
#    unsigned, and the j-summation costs zero VPU ops.
#  * R = 2^28 Montgomery fold: every diagonal contribution mod 2^28 fits a
#    u32 sum without wraparound (<= 15 terms * 2^28 < 2^32), so the packed
#    low word and the wrap count W need NO carry-compare chains (the
#    microbench prices those at ~2.5x an add) - S never materializes as a
#    128-bit quantity at all.
#  * the inter-stage twiddle runs lazily in R = 2^32 Montgomery form:
#    u = REDC32_lazy(v * twsl) + v * twsh  < 2q + q*2^3 stays a 2-word value
#    whose extra magnitude is absorbed by giving stage B one extra data
#    digit, instead of paying a canonical 64-bit Montgomery multiply.
#
# Outputs are canonical residues, bit-identical to the Karatsuba kernels and
# the XLA oracle path (tests/test_pallas.py asserts this).
# ---------------------------------------------------------------------------

_M28 = np.uint32(0x0FFFFFFF)


def _slice_tables(tables_u64: np.ndarray, moduli, chunks_d: int,
                  extra_pow2: int = 0) -> np.ndarray:
    """Per-data-digit pre-reduced digit planes [L, chunks_t, W, chunks_d*K]
    int8 with T_j = T * 2^(28 + 7j + extra_pow2) mod q concatenated along the
    contraction axis; chunks_t = ceil(max_bits/7)."""
    L, W, K = tables_u64.shape
    bits = max(int(q).bit_length() for q in moduli)
    chunks_t = -(-bits // CHUNK_BITS)
    out = np.zeros((L, chunks_t, W, chunks_d * K), dtype=np.int8)
    for l, q in enumerate(moduli):
        q = int(q)
        t_obj = tables_u64[l].astype(object)
        for j in range(chunks_d):
            tj = (t_obj * pow(2, 28 + CHUNK_BITS * j + extra_pow2, q) % q
                  ).astype(np.uint64)
            for c in range(chunks_t):
                out[l, c, :, j * K:(j + 1) * K] = (
                    (tj >> np.uint64(CHUNK_BITS * c)) & np.uint64(127)
                ).astype(np.int8)
    return out


def _sliced_consts(moduli) -> np.ndarray:
    """Per-limb SMEM constants (ql, qh, qinv32, qinv28, qinv_hi, 0)."""
    sc = np.zeros((len(moduli), 6), dtype=np.uint32)
    for l, q in enumerate(moduli):
        mc = MontConsts.make(int(q))
        sc[l, :5] = (q & 0xFFFFFFFF, q >> 32,
                     mc.qinv_neg & 0xFFFFFFFF, mc.qinv_neg & 0x0FFFFFFF,
                     mc.qinv_neg >> 32)
    return sc.reshape(len(moduli), 1, 6)


def _sliced_params(n_grid_axes: int = 0):
    """Mosaic params for the sliced kernels: the default 16 MB scoped-vmem
    limit is far below the chip's physical VMEM and the W-CRT stage tables
    alone exceed it; raising it was measured perf-neutral (round 1).
    MFHE_SLICED_SEMANTICS=parallel marks grid axes parallel (experiment)."""
    import os

    sem = None
    if n_grid_axes and os.environ.get("MFHE_SLICED_SEMANTICS") == "parallel":
        sem = ("parallel",) * n_grid_axes
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20,
                                dimension_semantics=sem)


def _data_digits(lo, hi, chunks: int, axis: int):
    """Extract `chunks` 7-bit digit planes of the (hi, lo) value and
    concatenate (as int8) along the contraction axis."""
    planes = [_digit(lo, hi, CHUNK_BITS * j).astype(jnp.int8)
              for j in range(chunks)]
    return jnp.concatenate(planes, axis=axis)


def _sliced_dots(dcat, table_planes, chunks_t: int, side: str):
    """chunks_t MXU dots of the concatenated data digits against the
    per-digit pre-reduced table planes."""
    if side == "right":
        return [jax.lax.dot_general(dcat, table_planes(c),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                for c in range(chunks_t)]
    return [jax.lax.dot_general(table_planes(c), dcat,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            for c in range(chunks_t)]


def _fold_redc28(diags, qh, ql, qi28, diag_bound: int, bits: int,
                 canonical: bool = True):
    """(hi, lo) = (sum_c diags[c] << 7c) * 2^-28 mod q, canonical.

    diag_bound: static (Python int) bound on every diagonal plane value;
    bits: modulus width.  Valid whenever S = sum diags[c]*2^(7c) < q * 2^28,
    which holds for every contraction this framework runs.

    Decompose each term d*2^(7c) = P_c + 2^28*H_c.  The P_c sum wrap-free
    in one u32 (<= 15 addends * 2^28 < 2^32), so S mod 2^28 and the wrap
    count cost no carry compares; carries in the H_c sum are inserted only
    where the *static* bound says a u32 wrap is possible (never, for 35-bit
    moduli at radix <= 512) - the fold runs in ~1/3 the weighted VPU ops of
    the 128-bit carry-counted pack + 64-bit REDC it replaces.
    """
    diags = [d.astype(U32) for d in diags]
    lo_sum = None           # sum of P_c, exact in u32
    acc_lo = None           # low word of sum of H_c
    acc_hi = None           # high word (only when the static bound needs it)
    acc_bound = 0
    n_lo_terms = 0

    def add_hi(t_lo, t_hi, tb):
        nonlocal acc_lo, acc_hi, acc_bound
        if acc_lo is None:
            acc_lo, acc_hi, acc_bound = t_lo, t_hi, tb
            return
        wraps_possible = (min(acc_bound, 0xFFFFFFFF)
                          + min(tb, 0xFFFFFFFF)) >> 32
        s_ = acc_lo + t_lo
        if wraps_possible:
            cc = (s_ < t_lo).astype(U32)
            acc_hi = cc if acc_hi is None else acc_hi + cc
        acc_lo = s_
        if t_hi is not None:
            acc_hi = t_hi if acc_hi is None else acc_hi + t_hi
        acc_bound += tb

    for c, d in enumerate(diags):
        s = CHUNK_BITS * c
        if s < 28:
            p = (d << np.uint32(s)) & _M28 if s else (
                d & _M28 if diag_bound >> 28 else d)
            lo_sum = p if lo_sum is None else lo_sum + p
            n_lo_terms += 1
            hb = diag_bound >> (28 - s)
            if hb:
                add_hi(d >> np.uint32(28 - s), None, hb)
        else:
            e = s - 28
            hb = diag_bound << e
            if e == 0:
                add_hi(d, None, hb)
            elif hb < (1 << 32):
                add_hi(d << np.uint32(e), None, hb)
            else:
                add_hi(d << np.uint32(e), d >> np.uint32(32 - e), hb)
    assert n_lo_terms < 15 and lo_sum is not None
    # m = S * (-q^-1) mod 2^28   (S mod 2^28 == lo_sum mod 2^28)
    m = ((lo_sum & _M28) * qi28) & _M28
    # u = m * q  (m < 2^28, q < 2^48)
    uh0, ul0 = _wide_mul(m, ql)
    if bits <= 35:
        uhi = uh0 + m * qh        # m*qh < 2^31; sum < 2^32: single word
        u28lo = (ul0 >> np.uint32(28)) | (uhi << np.uint32(4))
        u28hi = uhi >> np.uint32(28)
    else:
        if bits <= 48:
            h1, l1 = _mul_u32_u16(m, qh)
        else:
            # wide moduli (48 <= bits < 56, e.g. the reference's 55-bit
            # parity P prime, config.h:48): qh >= 2^16, full 32x32 product
            h1, l1 = _wide_mul(m, qh)
        uw1 = uh0 + l1
        uw2 = h1 + (uw1 < l1).astype(U32)
        u28lo = (ul0 >> np.uint32(28)) | (uw1 << np.uint32(4))
        u28hi = (uw1 >> np.uint32(28)) | (uw2 << np.uint32(4))
    # floor((lo_sum + u mod 2^28)/2^28) == (S mod 2^28 + u mod 2^28 >= 2^28)
    # + lo_sum's own multiples of 2^28, both parts of r, in one expression
    w_cnt = (lo_sum + (ul0 & _M28)) >> np.uint32(28)
    # r = sum H_c + w_cnt + u>>28  (exact; r < 2q)
    add_hi(w_cnt, None, 15)
    add_hi(u28lo, None, (1 << 32) - 1)
    rl = acc_lo
    rh = u28hi if acc_hi is None else acc_hi + u28hi
    if not canonical:
        return rh, rl
    ge = (rh > qh) | ((rh == qh) & (rl >= ql))
    borrow = (rl < ql).astype(U32)
    return (jnp.where(ge, rh - qh - borrow, rh),
            jnp.where(ge, rl - ql, rl))


def _tw_mul_lazy(vh, vl, twsl, twsh, qh, ql, qi32):
    """u = v * tw * 2^-32 mod q, LAZY (< 2q + q*twsh_max): tws = tw * 2^32
    mod q split as (twsh, twsl); v canonical.  For 35-bit moduli the result
    is < 2^39 and feeds a 6-digit extraction."""
    # p = v * twsl < q * 2^32  (3 words)
    h0, p0 = _wide_mul(vl, twsl)
    h1, l1 = _mul_u32_u16(twsl, vh)          # vh < 2^16 for q < 2^48
    p1 = h0 + l1
    p2 = h1 + (p1 < l1).astype(U32)
    # REDC32, lazy
    m = p0 * qi32
    uh0, ul0 = _wide_mul(m, ql)
    uh1, ul1 = _mul_u32_u16(m, qh)
    u1 = uh0 + ul1
    u2 = uh1 + (u1 < ul1).astype(U32)
    c0 = (p0 != 0).astype(U32)               # (p0 + u0) >> 32
    a = p1 + u1
    ca = (a < u1).astype(U32)
    rl = a + c0
    ca = ca + (rl < c0).astype(U32)
    rh = p2 + u2 + ca                        # (rh, rl) < 2q
    # w = v * twsh  (twsh < 2^16)
    wh, wl = _mul_u32_u16(vl, twsh)
    wh = wh + vh * twsh
    # u_lazy = r + w
    sl = rl + wl
    sh = rh + wh + (sl < wl).astype(U32)
    return sh, sl


def _sliced_tile(lo, hi, tA, tB, twl, twh, ql, qh, qi32, qi28, *,
                 chunks_d: int, chunks_t: int, chunks_mid: int,
                 sides: Tuple[str, str], k: int, bits: int,
                 qih=None, ctw: bool = False, kara_b=None,
                 lazy_a: bool = False):
    """Both four-step stages + inter-stage twiddle on one [n1, n2] tile
    (arrays in, arrays out — shared by the grid-pipelined and the
    explicit-DMA kernels).  tA/tB are accessors chunk-index -> plane.

    ctw (MFHE_SLICED_CTW=1): CANONICAL inter-stage twiddle — a full
    R=2^64 Montgomery multiply (tables carry tw*2^64 mod q) instead of
    the lazy R=2^32 form.  Costs ~8 extra VPU ops/element but feeds
    stage B a 5-digit extraction instead of 6, cutting stage-B MXU work
    by chunks_mid/chunks_d: the right trade when MXU is the binding
    resource (co-issue machine), the wrong one on a serial machine.

    kara_b (MFHE_SLICED_KARA_B=1): the "mixed" schedule from the round-3
    roof analysis (docs/PERF.md) — stage A stays sliced (cheapest VPU
    fold), the twiddle is canonical (implies ctw tables), and stage B
    runs in the round-1 Karatsuba CONVOLUTION form: 18 dots instead of
    25 at 5 digits (a 28% stage-B MXU cut) paid for with the heavier
    9-diagonal carry-counted pack + full REDC on the VPU.  Projected
    best variant if Mosaic co-issues MXU/VPU (~263k NTT/s at 35-bit),
    strictly worse on a serial machine — a measurement candidate, not a
    default.  kara_b is a (scheme, bias_bits, neg_c_words, pair_pack)
    tuple from _plan_scheme.

    lazy_a (round 5): leave the stage-A fold un-canonicalized (< 2q) and
    let the lazy twiddle absorb it (its output bound grows 2q + q*tsh ->
    3q + 2q*tsh; the caller only enables this when chunks_mid is
    unchanged at that bound, so the kernel output is bit-identical).
    The round-5 on-chip ablation showed the kernel is a serial
    VPU+MXU machine (no co-issue), so every canonicalization
    compare/select removed is wall-clock won."""
    axA = 0 if sides[0] == "left" else 1
    dcat = _data_digits(lo, hi, chunks_d, axA)
    diags = _sliced_dots(dcat, tA, chunks_t, sides[0])
    vh, vl = _fold_redc28(diags, qh, ql, qi28,
                          diag_bound=chunks_d * k * 127 * 127, bits=bits,
                          canonical=not lazy_a)
    if ctw or kara_b is not None:
        uh, ul = _montmul48(vh, vl, twh, twl, qh, ql, qih, qi32)
    else:
        uh, ul = _tw_mul_lazy(vh, vl, twl, twh, qh, ql, qi32)
    if kara_b is not None:
        scheme, bias_bits, neg_c_words, pair_pack = kara_b
        return _mod_matmul_tile(ul, uh, tB, (qh, ql, qih, qi32),
                                scheme=scheme, bias_bits=bias_bits,
                                neg_c_words=neg_c_words, side=sides[1],
                                pair_pack=pair_pack)
    axB = 0 if sides[1] == "left" else 1
    ucat = _data_digits(ul, uh, chunks_mid, axB)
    diags2 = _sliced_dots(ucat, tB, chunks_t, sides[1])
    return _fold_redc28(diags2, qh, ql, qi28,
                        diag_bound=chunks_mid * k * 127 * 127, bits=bits)


def _sliced_ntt_kernel(dlo_ref, dhi_ref, tA_ref, tB_ref, twl_ref, twh_ref,
                       sc_ref, olo_ref, ohi_ref,
                       *, chunks_d: int, chunks_t: int, chunks_mid: int,
                       sides: Tuple[str, str], k: int, bits: int, bb: int,
                       ctw: bool = False, kara_b=None, lazy_a: bool = False):
    """Both four-step stages + the inter-stage twiddle on one [n1, n2] tile
    (`bb` of them per grid cell), sliced-table fold design (see module
    comment above).

    MFHE_SLICED_ILV=1 (with bb >= 2) software-pipelines the unrolled tiles:
    tile j's stage-A MXU dots are issued before tile j-1's VPU tail, giving
    Mosaic's scheduler independent MXU and VPU work to co-issue.  ILV
    composes with ctw (round 5): with the VPU tail hidden under the MXU
    stream, the canonical twiddle's extra ~8 VPU ops are free and its
    5-digit stage-B extraction cuts the binding MXU time by chunks_mid/
    chunks_d — the schedule the round-3 roof analysis projects fastest."""
    import os as _os
    _abl = _os.environ.get("MFHE_SLICED_ABLATE", "")
    _ilv = _os.environ.get("MFHE_SLICED_ILV", "") == "1" and bb > 1
    if (ctw and _abl) or (kara_b is not None and (_ilv or _abl)):
        raise ValueError("MFHE_SLICED_KARA_B is incompatible with the "
                         "ILV/ablation experiment paths, and the ablation "
                         "rows assume the lazy 2^32-form twiddle tables")
    ql, qh = sc_ref[0, 0, 0], sc_ref[0, 0, 1]
    qi32, qi28 = sc_ref[0, 0, 2], sc_ref[0, 0, 3]
    if _ilv:
        qih_i = sc_ref[0, 0, 4]
        axA = 0 if sides[0] == "left" else 1
        axB = 0 if sides[1] == "left" else 1

        def _tail(j, diags):
            vh, vl = _fold_redc28(
                diags, qh, ql, qi28,
                diag_bound=chunks_d * k * 127 * 127, bits=bits,
                canonical=not lazy_a)
            if ctw:
                uh, ul = _montmul48(vh, vl, twh_ref[0, 0], twl_ref[0, 0],
                                    qh, ql, qih_i, qi32)
            else:
                uh, ul = _tw_mul_lazy(vh, vl, twl_ref[0, 0], twh_ref[0, 0],
                                      qh, ql, qi32)
            ucat = _data_digits(ul, uh, chunks_mid, axB)
            diags2 = _sliced_dots(ucat, lambda c: tB_ref[0, c], chunks_t,
                                  sides[1])
            rh, rl = _fold_redc28(
                diags2, qh, ql, qi28,
                diag_bound=chunks_mid * k * 127 * 127, bits=bits)
            olo_ref[0, j] = rl
            ohi_ref[0, j] = rh

        prev = None
        for j in range(bb):
            dcat = _data_digits(dlo_ref[0, j], dhi_ref[0, j], chunks_d, axA)
            diags = _sliced_dots(dcat, lambda c: tA_ref[0, c], chunks_t,
                                 sides[0])
            if prev is not None:
                _tail(*prev)
            prev = (j, diags)
        _tail(*prev)
        return
    qih = sc_ref[0, 0, 4]
    for j in range(bb):
        lo = dlo_ref[0, j]
        hi = dhi_ref[0, j]
        if _abl == "io":
            olo_ref[0, j] = lo
            ohi_ref[0, j] = hi
            continue
        if not _abl:
            rh, rl = _sliced_tile(
                lo, hi, lambda c: tA_ref[0, c], lambda c: tB_ref[0, c],
                twl_ref[0, 0], twh_ref[0, 0], ql, qh, qi32, qi28,
                chunks_d=chunks_d, chunks_t=chunks_t, chunks_mid=chunks_mid,
                sides=sides, k=k, bits=bits, qih=qih, ctw=ctw, kara_b=kara_b,
                lazy_a=lazy_a)
            olo_ref[0, j] = rl
            ohi_ref[0, j] = rh
            continue
        axA = 0 if sides[0] == "left" else 1
        dcat = _data_digits(lo, hi, chunks_d, axA)
        if _abl == "extract":
            s = dcat.astype(jnp.int32)
            acc = (s[:k] if axA == 0 else s[:, :k]).astype(U32)
            olo_ref[0, j] = acc
            ohi_ref[0, j] = acc
            continue
        diags = _sliced_dots(dcat, lambda c: tA_ref[0, c], chunks_t, sides[0])
        if _abl == "dots":
            acc = sum(diags).astype(U32)
            olo_ref[0, j] = acc
            ohi_ref[0, j] = acc
            continue
        vh, vl = _fold_redc28(diags, qh, ql, qi28,
                              diag_bound=chunks_d * k * 127 * 127, bits=bits,
                              canonical=not lazy_a)
        if _abl == "stage1":
            olo_ref[0, j] = vl
            ohi_ref[0, j] = vh
            continue
        uh, ul = _tw_mul_lazy(vh, vl, twl_ref[0, 0], twh_ref[0, 0],
                              qh, ql, qi32)
        if _abl == "tw":
            olo_ref[0, j] = ul
            ohi_ref[0, j] = uh
            continue
        axB = 0 if sides[1] == "left" else 1
        ucat = _data_digits(ul, uh, chunks_mid, axB)
        diags2 = _sliced_dots(ucat, lambda c: tB_ref[0, c], chunks_t,
                              sides[1])
        rh, rl = _fold_redc28(diags2, qh, ql, qi28,
                              diag_bound=chunks_mid * k * 127 * 127,
                              bits=bits)
        olo_ref[0, j] = rl
        ohi_ref[0, j] = rh


def _sliced_dma_kernel(dlo_hbm, dhi_hbm, tA_ref, tB_ref, twl_ref, twh_ref,
                       sc_ref, olo_hbm, ohi_hbm,
                       *, chunks_d: int, chunks_t: int, chunks_mid: int,
                       sides: Tuple[str, str], k: int, bits: int, B: int,
                       ctw: bool = False, kara_b=None, lazy_a: bool = False):
    """Explicit-DMA double-buffered variant of _sliced_ntt_kernel
    (MFHE_SLICED_DMA=1): grid is (L,) only; the B axis streams through a
    2-slot VMEM scratch ring with hand-issued async copies, so tile b+1's
    HBM fetch and tile b-1's writeback run during tile b's compute
    regardless of what Mosaic's automatic pipeliner chooses to overlap.

    This targets the round-2 measured no-overlap behavior (docs/PERF.md:
    components sum linearly, io ~1.77 us/NTT of the 9.1 us total)."""
    l = pl.program_id(0)
    ql, qh = sc_ref[0, 0, 0], sc_ref[0, 0, 1]
    qi32, qi28 = sc_ref[0, 0, 2], sc_ref[0, 0, 3]
    qih = sc_ref[0, 0, 4]

    def body(ilo, ihi, slo, shi, isem_l, isem_h, osem_l, osem_h):
        def in_lo(b, s):
            return pltpu.make_async_copy(dlo_hbm.at[l, b], ilo.at[s],
                                         isem_l.at[s])

        def in_hi(b, s):
            return pltpu.make_async_copy(dhi_hbm.at[l, b], ihi.at[s],
                                         isem_h.at[s])

        def out_lo(b, s):
            return pltpu.make_async_copy(slo.at[s], olo_hbm.at[l, b],
                                         osem_l.at[s])

        def out_hi(b, s):
            return pltpu.make_async_copy(shi.at[s], ohi_hbm.at[l, b],
                                         osem_h.at[s])

        in_lo(0, 0).start()
        in_hi(0, 0).start()

        def loop(b, _):
            s = jax.lax.rem(b, 2)
            nxt = jax.lax.rem(b + 1, 2)

            @pl.when(b + 1 < B)
            def _():
                in_lo(b + 1, nxt).start()
                in_hi(b + 1, nxt).start()

            in_lo(b, s).wait()
            in_hi(b, s).wait()

            @pl.when(b >= 2)
            def _():
                out_lo(b - 2, s).wait()
                out_hi(b - 2, s).wait()

            rh, rl = _sliced_tile(
                ilo[s], ihi[s], lambda c: tA_ref[0, c], lambda c: tB_ref[0, c],
                twl_ref[0, 0], twh_ref[0, 0], ql, qh, qi32, qi28,
                chunks_d=chunks_d, chunks_t=chunks_t, chunks_mid=chunks_mid,
                sides=sides, k=k, bits=bits, qih=qih, ctw=ctw, kara_b=kara_b,
                lazy_a=lazy_a)
            slo[s] = rl
            shi[s] = rh
            out_lo(b, s).start()
            out_hi(b, s).start()
            return 0

        jax.lax.fori_loop(0, B, loop, 0)
        for b in range(max(0, B - 2), B):
            out_lo(b, b % 2).wait()
            out_hi(b, b % 2).wait()

    n1 = dlo_hbm.shape[2]
    n2 = dlo_hbm.shape[3]
    pl.run_scoped(
        body,
        ilo=pltpu.VMEM((2, n1, n2), jnp.uint32),
        ihi=pltpu.VMEM((2, n1, n2), jnp.uint32),
        slo=pltpu.VMEM((2, n1, n2), jnp.uint32),
        shi=pltpu.VMEM((2, n1, n2), jnp.uint32),
        isem_l=pltpu.SemaphoreType.DMA((2,)),
        isem_h=pltpu.SemaphoreType.DMA((2,)),
        osem_l=pltpu.SemaphoreType.DMA((2,)),
        osem_h=pltpu.SemaphoreType.DMA((2,)),
    )


def _sliced_stage_kernel(dlo_ref, dhi_ref, tch_ref, sc_ref, olo_ref, ohi_ref,
                         *, chunks_d: int, chunks_t: int, side: str, k: int,
                         bits: int, in_bound: int):
    """One sliced-fold modular-matmul stage (no twiddle): the W-CRT /
    X-NTT single-stage replacement for _stage_kernel with ~3x fewer
    weighted VPU ops per element."""
    ql, qh = sc_ref[0, 0, 0], sc_ref[0, 0, 1]
    qi28 = sc_ref[0, 0, 3]
    lo = dlo_ref[0]
    hi = dhi_ref[0]
    ax = 0 if side == "left" else 1
    dcat = _data_digits(lo, hi, chunks_d, ax)
    diags = _sliced_dots(dcat, lambda c: tch_ref[0, c], chunks_t, side)
    rh, rl = _fold_redc28(diags, qh, ql, qi28,
                          diag_bound=chunks_d * k * 127 * 127, bits=bits)
    olo_ref[0] = rl
    ohi_ref[0] = rh


class SlicedStage:
    """Drop-in for PallasStage (sides 'right'/'left', no twiddle) with the
    sliced-table fold.  Tables pre-reduced per data digit; one R=2^28 REDC
    per output; bit-identical canonical outputs."""

    def __init__(self, tables_u64: np.ndarray, moduli,
                 row_tile: int = 256, side: str = "right",
                 in_bits: int | None = None):
        assert side in ("right", "left")
        L, W, K = tables_u64.shape
        self.side = side
        self.L, self.w, self.k = L, W, K
        self.row_tile = row_tile
        self.bits = max(int(q).bit_length() for q in moduli)
        # The sliced fold is valid for any width while S = sum diag*2^(7c)
        # stays inside the R=2^28 REDC domain (S < q*2^28, checked exactly
        # below) and the canonical pair fits two u32 words (q < 2^56).
        # This admits the reference's 55-bit parity P prime (config.h:48) —
        # the run that previously fell back to the XLA-composed path
        # (VERDICT r3 Weak #3 / Next #4).
        assert self.bits < 56, "moduli must be < 2^56 for the u32-pair form"
        in_bits = self.bits if in_bits is None else in_bits
        self.chunks_d = -(-in_bits // CHUNK_BITS)
        self.chunks_t = -(-self.bits // CHUNK_BITS)
        diag_bound = self.chunks_d * K * 127 * 127
        s_max = sum(diag_bound << (CHUNK_BITS * c)
                    for c in range(self.chunks_t))
        assert s_max < min(int(q) for q in moduli) << 28, \
            "contraction exceeds the R=2^28 REDC domain"
        self._tch = jnp.asarray(
            _slice_tables(tables_u64, moduli, self.chunks_d))
        self._sc = jnp.asarray(_sliced_consts(moduli))

    @functools.lru_cache(maxsize=16)
    def _call(self, rows: int, tile: int):
        L, K, W = self.L, self.k, self.w
        kern = functools.partial(
            _sliced_stage_kernel, chunks_d=self.chunks_d,
            chunks_t=self.chunks_t, side=self.side, k=K, bits=self.bits,
            in_bound=0)
        nt = rows // tile
        tch_spec = pl.BlockSpec((1, self.chunks_t, W, self.chunks_d * K),
                                lambda l, r: (l, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 6), lambda l, r: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        if self.side == "right":
            data_spec = pl.BlockSpec((1, tile, K), lambda l, r: (l, r, 0),
                                     memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((1, tile, W), lambda l, r: (l, r, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = (L, rows, W)
        else:
            data_spec = pl.BlockSpec((1, K, tile), lambda l, m: (l, 0, m),
                                     memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((1, W, tile), lambda l, m: (l, 0, m),
                                    memory_space=pltpu.VMEM)
            out_shape = (L, W, rows)
        return pl.pallas_call(
            kern,
            grid=(L, nt),
            in_specs=[data_spec, data_spec, tch_spec, sc_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct(out_shape, jnp.uint32),
                       jax.ShapeDtypeStruct(out_shape, jnp.uint32)),
            interpret=_backend.pallas_interpret_default(),
            compiler_params=_sliced_params(2),
        )

    def __call__(self, d_lo, d_hi):
        rows = d_lo.shape[1] if self.side == "right" else d_lo.shape[2]
        tile = min(self.row_tile, rows)
        while rows % tile:
            tile //= 2
        call = self._call(rows, tile)
        with jax.enable_x64(False):
            return call(d_lo, d_hi, self._tch, self._sc)


def _inv_compose_kernel(dlo_ref, dhi_ref, tch_ref, sc_ref, cc_ref, qf_ref,
                        acc_lo_ref, acc_hi_ref, kacc_ref,
                        *, chunks_d: int, chunks_t: int, k: int, bits: int,
                        n_limbs: int):
    """Scaled W-CRT inverse stage FUSED with the CRT compose partials.

    Grid (m-tiles, limbs), limb fastest: each limb's fold result
    r'_l = x * M_l^{-1} mod q_l is immediately folded into the two compose
    accumulators instead of being written to HBM:
      acc64  += r'_l * (M_l mod 2^64)      (exact, mod 2^64)
      kacc   += float(r'_l) / q_l           (f32; the true sum is within
                                             ~2^-300 of an integer, so f32's
                                             ~1e-5 error never moves k)
    cc: per-limb SMEM constants (M64_lo, M64_hi, 1/q as f32 bits).
    Host side combines runs and applies y = acc - round(ksum)*Q mod 2^64,
    centered /delta (ops/ddfloat._compose_tail)."""
    l = pl.program_id(1)
    ql, qh = sc_ref[0, 0, 0], sc_ref[0, 0, 1]
    qi28 = sc_ref[0, 0, 3]
    dcat = _data_digits(dlo_ref[0], dhi_ref[0], chunks_d, 0)
    diags = _sliced_dots(dcat, lambda c: tch_ref[0, c], chunks_t, "left")
    rh, rl = _fold_redc28(diags, qh, ql, qi28,
                          diag_bound=chunks_d * k * 127 * 127, bits=bits)
    m64l, m64h = cc_ref[0, 0, 0], cc_ref[0, 0, 1]
    ph, pl_ = _mullo64(rh, rl, m64h, m64l)
    qinv_f = qf_ref[0, 0, 0]
    # Mosaic has no u32->f32 cast; go via i32 (rl may exceed 2^31: split a
    # bit off; rh < 2^16 for q < 2^48)
    rl_f = ((rl >> np.uint32(1)).astype(jnp.int32).astype(jnp.float32)
            * np.float32(2.0)
            + (rl & np.uint32(1)).astype(jnp.int32).astype(jnp.float32))
    kterm = (rl_f * qinv_f
             + rh.astype(jnp.int32).astype(jnp.float32)
             * (qinv_f * np.float32(2.0 ** 32)))

    @pl.when(l == 0)
    def _init():
        acc_lo_ref[...] = pl_
        acc_hi_ref[...] = ph
        kacc_ref[...] = kterm

    @pl.when(l > 0)
    def _acc():
        a = acc_lo_ref[...] + pl_
        c = (a < pl_).astype(U32)
        acc_lo_ref[...] = a
        acc_hi_ref[...] = acc_hi_ref[...] + ph + c
        kacc_ref[...] = kacc_ref[...] + kterm


class SlicedInvCompose:
    """One limb-run of the scaled W-CRT inverse with the CRT compose fused
    in: eval residues [L, W, M] (u32 pairs) -> compose partials
    (acc_lo, acc_hi u32 [Wout, M], kacc f32 [Wout, M])."""

    def __init__(self, tables_u64: np.ndarray, moduli, big_q: int,
                 row_tile: int = 256):
        L, W, K = tables_u64.shape
        self.L, self.w, self.k = L, W, K
        self.row_tile = row_tile
        self.bits = max(int(q).bit_length() for q in moduli)
        self.chunks_d = -(-self.bits // CHUNK_BITS)
        self.chunks_t = self.chunks_d
        self._tch = jnp.asarray(_slice_tables(tables_u64, moduli,
                                              self.chunks_d))
        self._sc = jnp.asarray(_sliced_consts(moduli))
        cc = np.zeros((L, 1, 2), dtype=np.uint32)
        qf = np.zeros((L, 1, 1), dtype=np.float32)
        for l, q in enumerate(moduli):
            q = int(q)
            m64 = (big_q // q) % (1 << 64)
            cc[l, 0, 0] = m64 & 0xFFFFFFFF
            cc[l, 0, 1] = m64 >> 32
            qf[l, 0, 0] = np.float32(1.0 / q)
        self._cc = jnp.asarray(cc)
        self._qf = jnp.asarray(qf)

    @functools.lru_cache(maxsize=8)
    def _call(self, rows: int, tile: int):
        L, K, W = self.L, self.k, self.w
        kern = functools.partial(
            _inv_compose_kernel, chunks_d=self.chunks_d,
            chunks_t=self.chunks_t, k=K, bits=self.bits, n_limbs=L)
        nt = rows // tile
        data_spec = pl.BlockSpec((1, K, tile), lambda m, l: (l, 0, m),
                                 memory_space=pltpu.VMEM)
        tch_spec = pl.BlockSpec((1, self.chunks_t, W, self.chunks_d * K),
                                lambda m, l: (l, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 6), lambda m, l: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        cc_spec = pl.BlockSpec((1, 1, 2), lambda m, l: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        qf_spec = pl.BlockSpec((1, 1, 1), lambda m, l: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((W, tile), lambda m, l: (0, m),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(nt, L),
            in_specs=[data_spec, data_spec, tch_spec, sc_spec, cc_spec,
                      qf_spec],
            out_specs=(out_spec, out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((W, rows), jnp.uint32),
                       jax.ShapeDtypeStruct((W, rows), jnp.uint32),
                       jax.ShapeDtypeStruct((W, rows), jnp.float32)),
            interpret=_backend.pallas_interpret_default(),
            compiler_params=_sliced_params(),
        )

    def __call__(self, d_lo, d_hi):
        rows = d_lo.shape[2]
        tile = min(self.row_tile, rows)
        while rows % tile:
            tile //= 2
        call = self._call(rows, tile)
        with jax.enable_x64(False):
            return call(d_lo, d_hi, self._tch, self._sc, self._cc, self._qf)


def _sliced_mul_ntt_kernel(dlo_ref, dhi_ref, slo_ref, shi_ref, tf_ref,
                           ti_ref, sc_ref, olo_ref, ohi_ref,
                           *, chunks_d: int, chunks_t: int, chunks_mid: int,
                           k: int, bits: int, rep: int, kara_b=None):
    """iNTT_X(NTT_X(a) * s) with the sliced fold: forward stage, lazy
    Montgomery multiply by s (stored s * 2^32 mod q), 6..9-digit inverse
    stage consuming the lazy value (same mechanics as the four-step
    inter-stage twiddle).

    kara_b (MFHE_SLICED_KARA_B=1): same mixed schedule as the four-step
    kernel — canonical s-multiply (s arrives as s_mont = s * 2^64, so one
    _montmul48 gives the plain product) + Karatsuba convolution-form
    inverse stage."""
    ql, qh = sc_ref[0, 0, 0], sc_ref[0, 0, 1]
    qi32, qi28 = sc_ref[0, 0, 2], sc_ref[0, 0, 3]
    lo = dlo_ref[0]
    hi = dhi_ref[0]
    dcat = _data_digits(lo, hi, chunks_d, 1)
    diags = _sliced_dots(dcat, lambda c: tf_ref[0, c], chunks_t, "right")
    vh, vl = _fold_redc28(diags, qh, ql, qi28,
                          diag_bound=chunks_d * k * 127 * 127, bits=bits)
    sl = slo_ref[0]
    sh = shi_ref[0]
    if rep > 1:
        tw_rows, kk = sl.shape
        sl = jnp.broadcast_to(sl[:, None, :], (tw_rows, rep, kk)
                              ).reshape(tw_rows * rep, kk)
        sh = jnp.broadcast_to(sh[:, None, :], (tw_rows, rep, kk)
                              ).reshape(tw_rows * rep, kk)
    if kara_b is not None:
        qih = sc_ref[0, 0, 4]
        uh, ul = _montmul48(vh, vl, sh, sl, qh, ql, qih, qi32)
        scheme, bias_bits, neg_c_words, pair_pack = kara_b
        rh, rl = _mod_matmul_tile(ul, uh, lambda c: ti_ref[0, c],
                                  (qh, ql, qih, qi32), scheme=scheme,
                                  bias_bits=bias_bits,
                                  neg_c_words=neg_c_words, side="right",
                                  pair_pack=pair_pack)
        olo_ref[0] = rl
        ohi_ref[0] = rh
        return
    uh, ul = _tw_mul_lazy(vh, vl, sl, sh, qh, ql, qi32)
    ucat = _data_digits(ul, uh, chunks_mid, 1)
    diags2 = _sliced_dots(ucat, lambda c: ti_ref[0, c], chunks_t, "right")
    rh, rl = _fold_redc28(diags2, qh, ql, qi28,
                          diag_bound=chunks_mid * k * 127 * 127, bits=bits)
    olo_ref[0] = rl
    ohi_ref[0] = rh


class SlicedNttMulNtt:
    """Drop-in for PallasNttMulNtt: fused t = iNTT_X(NTT_X(a) * s) over
    [L, R, K] rows with s [L, W, K], R = W * rep, sliced-table fold."""

    def __init__(self, fwd_tables: np.ndarray, inv_tables: np.ndarray,
                 moduli, rep: int, row_tile: int = 256):
        L, W, K = fwd_tables.shape
        assert W == K and inv_tables.shape == fwd_tables.shape
        self.L, self.k = L, K
        self.rep = rep
        self.row_tile = max(rep, row_tile // rep * rep)
        self.bits = max(int(q).bit_length() for q in moduli)
        assert self.bits < 48
        self.chunks_d = -(-self.bits // CHUNK_BITS)
        self.chunks_t = self.chunks_d
        import os
        self.kara_b = os.environ.get("MFHE_SLICED_KARA_B") == "1"
        if self.kara_b:
            self.chunks_mid = self.chunks_d
        else:
            lazy_bits = self.bits + max(2, self.bits - 31)
            self.chunks_mid = -(-lazy_bits // CHUNK_BITS)
        self._tf = jnp.asarray(_slice_tables(fwd_tables, moduli,
                                             self.chunks_d))
        if self.kara_b:
            # mixed schedule: canonical s-product (one _montmul48 on the
            # s_mont storage form), inverse stage in the Karatsuba
            # convolution form (Montgomery-domain combo planes)
            self._kb = _plan_scheme(K, self.bits)
            self._ti = jnp.asarray(
                _split_tables(inv_tables, moduli, self._kb[0].combos))
        else:
            self._kb = None
            # s arrives in SecretKey storage form s_mont = s * 2^64 mod q;
            # the lazy multiply then yields v * s * 2^32, and the extra
            # 2^32 is cancelled by folding 2^-32 into the inverse tables
            self._ti = jnp.asarray(_slice_tables(inv_tables, moduli,
                                                 self.chunks_mid,
                                                 extra_pow2=-32))
        self._sc = jnp.asarray(_sliced_consts(moduli))
        self.moduli = tuple(int(q) for q in moduli)

    @functools.lru_cache(maxsize=8)
    def _call(self, rows: int, tile: int):
        L, K = self.L, self.k
        kern = functools.partial(
            _sliced_mul_ntt_kernel, chunks_d=self.chunks_d,
            chunks_t=self.chunks_t, chunks_mid=self.chunks_mid,
            k=K, bits=self.bits, rep=self.rep, kara_b=self._kb)
        nt = rows // tile
        tw = tile // self.rep
        data_spec = pl.BlockSpec((1, tile, K), lambda l, r: (l, r, 0),
                                 memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, tw, K), lambda l, r: (l, r, 0),
                              memory_space=pltpu.VMEM)
        tf_spec = pl.BlockSpec((1, self.chunks_t, K, self.chunks_d * K),
                               lambda l, r: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        if self.kara_b:
            ti_block = (1, len(self._kb[0].combos), K, K)
        else:
            ti_block = (1, self.chunks_t, K, self.chunks_mid * K)
        ti_spec = pl.BlockSpec(ti_block,
                               lambda l, r: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 6), lambda l, r: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kern,
            grid=(L, nt),
            in_specs=[data_spec, data_spec, s_spec, s_spec,
                      tf_spec, ti_spec, sc_spec],
            out_specs=(data_spec, data_spec),
            out_shape=(jax.ShapeDtypeStruct((L, rows, K), jnp.uint32),
                       jax.ShapeDtypeStruct((L, rows, K), jnp.uint32)),
            interpret=_backend.pallas_interpret_default(),
            compiler_params=_sliced_params(2),
        )

    def __call__(self, d_lo, d_hi, s_lo, s_hi):
        """s as the u32 pair of s_mont (s * 2^64 mod q, SecretKey storage
        form) — drop-in for PallasNttMulNtt."""
        rows = d_lo.shape[1]
        if rows % self.rep:
            raise ValueError(f"rows {rows} not a multiple of rep {self.rep}")
        tile = _mul_ntt_tile(rows, self.rep, self.row_tile)
        call = self._call(rows, tile)
        with jax.enable_x64(False):
            return call(d_lo, d_hi, s_lo, s_hi, self._tf, self._ti, self._sc)


def make_stage(tables_u64, moduli, row_tile: int = 256, side: str = "right"):
    """PallasStage/SlicedStage factory (MFHE_STAGE_IMPL=karatsuba for the
    round-1 kernels; sliced is the default).  Runs with moduli >= 2^48
    always use SlicedStage — its R=2^28 fold is width-generic up to 2^56,
    while the karatsuba packer's REDC is specialized to q < 2^48."""
    import os

    wide = max(int(q).bit_length() for q in moduli) >= 48
    if wide or os.environ.get("MFHE_STAGE_IMPL", "sliced") == "sliced":
        return SlicedStage(np.asarray(tables_u64), moduli,
                           row_tile=row_tile, side=side)
    return PallasStage(np.asarray(tables_u64), moduli,
                       row_tile=row_tile, side=side)


def make_stage_hybrid(tables_u64, moduli, row_tile: int = 256,
                      side: str = "right"):
    """make_stage for every width on the Mosaic path (round 4: SlicedStage
    handles moduli up to 2^56, so the reference's 55-bit parity P prime
    (config.h:48-52) now runs its QP transforms in-kernel like every other
    limb run — VERDICT r3 Next #4).  MFHE_WIDE_FALLBACK=1 reverts wide
    runs to the XLA-composed BatchedModTransform (the round-3 escape
    hatch, exact at any width; same (lo, hi)-pair call contract)."""
    import os

    wide = max(int(q).bit_length() for q in moduli) >= 48
    if not wide or os.environ.get("MFHE_WIDE_FALLBACK", "") != "1":
        return make_stage(tables_u64, moduli, row_tile=row_tile, side=side)
    from .modmatmul import BatchedModTransform
    bt = BatchedModTransform(np.asarray(tables_u64), moduli, side=side)

    def st(dlo, dhi):
        return split_u64(bt(join_u64(dlo, dhi)))
    return st


def make_ntt_mul_ntt(fwd_tables, inv_tables, moduli, rep: int,
                     row_tile: int = 256):
    """PallasNttMulNtt/SlicedNttMulNtt factory (same knob as make_stage)."""
    import os

    if os.environ.get("MFHE_STAGE_IMPL", "sliced") == "sliced":
        return SlicedNttMulNtt(np.asarray(fwd_tables),
                               np.asarray(inv_tables), moduli, rep,
                               row_tile=row_tile)
    return PallasNttMulNtt(np.asarray(fwd_tables), np.asarray(inv_tables),
                           moduli, rep, row_tile=row_tile)


class SlicedFourStepNTT:
    """Fused two-stage negacyclic NTT with the sliced-table fold.  Same API
    and bit-identical output order/values as PallasFourStepNTT; ~3x fewer
    per-element VPU ops (the round-1 kernel's binding resource).

    Requires max modulus < 2^35 + a bit (the lazy twiddle feeds stage B a
    value < 2q + q*2^(bits-32); chunks_mid covers it) - every bench/ref
    four-step modulus qualifies; wider moduli fall back to PallasFourStepNTT.
    """

    def __init__(self, plan: FourStepPlan, row_tile: int = 256):
        if plan.n1 != plan.n2:
            raise ValueError("SlicedFourStepNTT requires n1 == n2")
        self.plan = plan
        mods = plan.moduli
        bits = max(int(q).bit_length() for q in mods)
        self.chunks_d = -(-bits // CHUNK_BITS)
        self.chunks_t = self.chunks_d
        import os
        self.ctw = os.environ.get("MFHE_SLICED_CTW") == "1"
        self.kara_b = os.environ.get("MFHE_SLICED_KARA_B") == "1"
        if self.kara_b:
            # the mixed schedule needs a canonical (< q) stage-B input
            self.ctw = True
        if self.ctw:
            # canonical twiddle: stage B sees a < q value, chunks_d digits
            self.chunks_mid = self.chunks_d
            self.lazy_a = False
            tw_pow = 64
        else:
            # lazy twiddle output bound (see _tw_mul_lazy): with canonical
            # stage-A input v < q it is < 2q + q*tsh_max; with the lazy
            # stage-A fold (round 5: skip the fold's canonicalization,
            # v < 2q) it is < 3q + 2q*tsh_max.  Enable lazy-A only when it
            # does not cost a stage-B digit, so output bits are identical
            # and the variant is pure VPU savings.
            qm = max(int(q) for q in mods)
            tsh_max = (qm - 1) >> 32      # high word of tw*2^32 mod q
            cm_canon = -(-(2 * qm + qm * tsh_max).bit_length() // CHUNK_BITS)
            cm_lazy = -(-(3 * qm + 2 * qm * tsh_max).bit_length()
                        // CHUNK_BITS)
            self.lazy_a = (os.environ.get("MFHE_SLICED_LAZYA", "1") == "1"
                           and cm_lazy == cm_canon)
            self.chunks_mid = cm_lazy if self.lazy_a else cm_canon
            tw_pow = 32
        t1f, t2f, t1i, t2i, twf, twi = _four_step_tables(plan)
        self._t1f = jnp.asarray(_slice_tables(t1f, mods, self.chunks_d))
        self._t2i = jnp.asarray(_slice_tables(t2i, mods, self.chunks_d))
        if self.kara_b:
            # second-applied stage in the round-1 convolution form
            # (Montgomery-domain combo planes, Karatsuba grid)
            (scheme_b, bias_b, negc_b, pp_b) = _plan_scheme(plan.n1, bits)
            self._kb = (scheme_b, bias_b, negc_b, pp_b)
            self._t2f = jnp.asarray(_split_tables(t2f, mods, scheme_b.combos))
            self._t1i = jnp.asarray(_split_tables(t1i, mods, scheme_b.combos))
        else:
            self._kb = None
            self._t2f = jnp.asarray(_slice_tables(t2f, mods, self.chunks_mid))
            self._t1i = jnp.asarray(_slice_tables(t1i, mods, self.chunks_mid))
        tws_f = np.empty_like(twf)
        tws_i = np.empty_like(twi)
        for l, q in enumerate(mods):
            q = int(q)
            tws_f[l] = (twf[l].astype(object) * ((1 << tw_pow) % q) % q
                        ).astype(np.uint64)
            tws_i[l] = (twi[l].astype(object) * ((1 << tw_pow) % q) % q
                        ).astype(np.uint64)
        self._twf = (jnp.asarray((tws_f & np.uint64(0xFFFFFFFF))
                                 .astype(np.uint32)),
                     jnp.asarray((tws_f >> np.uint64(32)).astype(np.uint32)))
        self._twi = (jnp.asarray((tws_i & np.uint64(0xFFFFFFFF))
                                 .astype(np.uint32)),
                     jnp.asarray((tws_i >> np.uint64(32)).astype(np.uint32)))
        self._sc = jnp.asarray(_sliced_consts(mods))
        self.L = len(mods)

    @functools.lru_cache(maxsize=8)
    def _fused_call(self, B: int, direction: str):
        import os

        p = self.plan
        L, n1, n2 = self.L, p.n1, p.n2
        fwd = direction == "fwd"
        sides = ("left", "right") if fwd else ("right", "left")
        cA = self.chunks_d
        bits = max(int(q).bit_length() for q in p.moduli)
        bb = max(1, int(os.environ.get("MFHE_SLICED_BB", "1")))
        while B % bb:
            bb //= 2
        if self.kara_b:
            nb_planes = len(self._kb[0].combos)
            tB_block = (1, nb_planes, n1, n1)
        else:
            tB_block = (1, self.chunks_t, n1, self.chunks_mid * n1)
        if os.environ.get("MFHE_SLICED_DMA") == "1":
            kern = functools.partial(
                _sliced_dma_kernel, chunks_d=cA, chunks_t=self.chunks_t,
                chunks_mid=self.chunks_mid, sides=sides, k=n1, bits=bits,
                B=B, ctw=self.ctw, kara_b=self._kb, lazy_a=self.lazy_a)
            hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
            return pl.pallas_call(
                kern,
                grid=(L,),
                in_specs=[hbm_spec, hbm_spec,
                          pl.BlockSpec((1, self.chunks_t, n1, cA * n1),
                                       lambda l: (l, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(tB_block,
                                       lambda l: (l, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, 1, n1, n2), lambda l: (l, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, 1, n1, n2), lambda l: (l, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, 1, 6), lambda l: (l, 0, 0),
                                       memory_space=pltpu.SMEM)],
                out_specs=(hbm_spec, hbm_spec),
                out_shape=(jax.ShapeDtypeStruct((L, B, n1, n2), jnp.uint32),
                           jax.ShapeDtypeStruct((L, B, n1, n2), jnp.uint32)),
                interpret=_backend.pallas_interpret_default(),
                compiler_params=_sliced_params(1),
            )
        kern = functools.partial(
            _sliced_ntt_kernel, chunks_d=cA, chunks_t=self.chunks_t,
            chunks_mid=self.chunks_mid, sides=sides, k=n1, bits=bits, bb=bb,
            ctw=self.ctw, kara_b=self._kb, lazy_a=self.lazy_a)
        data_spec = pl.BlockSpec((1, bb, n1, n2), lambda l, b: (l, b, 0, 0),
                                 memory_space=pltpu.VMEM)
        tA_spec = pl.BlockSpec((1, self.chunks_t, n1, cA * n1),
                               lambda l, b: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        tB_spec = pl.BlockSpec(tB_block,
                               lambda l, b: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        tw_spec = pl.BlockSpec((1, 1, n1, n2), lambda l, b: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 6), lambda l, b: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        alias = ({0: 0, 1: 1}
                 if os.environ.get("MFHE_SLICED_ALIAS") == "1" else {})
        return pl.pallas_call(
            kern,
            grid=(L, B // bb),
            in_specs=[data_spec, data_spec, tA_spec, tB_spec,
                      tw_spec, tw_spec, sc_spec],
            out_specs=(data_spec, data_spec),
            out_shape=(jax.ShapeDtypeStruct((L, B, n1, n2), jnp.uint32),
                       jax.ShapeDtypeStruct((L, B, n1, n2), jnp.uint32)),
            interpret=_backend.pallas_interpret_default(),
            compiler_params=_sliced_params(2),
            input_output_aliases=alias,
        )

    def _run(self, lo, hi, direction):
        p = self.plan
        L, B = lo.shape[0], lo.shape[1]
        olo, ohi = self._run4(lo.reshape(L, B, p.n1, p.n2),
                              hi.reshape(L, B, p.n1, p.n2), direction)
        return olo.reshape(L, B, p.n), ohi.reshape(L, B, p.n)

    def forward_pair(self, lo, hi):
        return self._run(lo, hi, "fwd")

    def inverse_pair(self, lo, hi):
        return self._run(lo, hi, "inv")

    def _run4(self, lo4, hi4, direction):
        """[L, B, n1, n2] pair in, same shape out — no reshapes.  XLA
        materializes real copies for the [L,B,N]<->[L,B,n1,n2] reshapes
        around the Mosaic custom call (~3.4 us/NTT measured!), so
        throughput callers should stay in the 4-D tile layout end to end."""
        if direction == "fwd":
            tA, tB = self._t1f, self._t2f
            twl, twh = self._twf
        else:
            tA, tB = self._t2i, self._t1i
            twl, twh = self._twi
        p = self.plan
        call = self._fused_call(lo4.shape[1], direction)
        twl4 = twl.reshape(self.L, 1, p.n1, p.n2)
        twh4 = twh.reshape(self.L, 1, p.n1, p.n2)
        with jax.enable_x64(False):
            return call(lo4, hi4, tA, tB, twl4, twh4, self._sc)

    def forward_pair4(self, lo4, hi4):
        return self._run4(lo4, hi4, "fwd")

    def inverse_pair4(self, lo4, hi4):
        return self._run4(lo4, hi4, "inv")

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        return join_u64(*self.forward_pair(*split_u64(x)))

    def inverse(self, xf: jnp.ndarray) -> jnp.ndarray:
        return join_u64(*self.inverse_pair(*split_u64(xf)))
