"""Fused Pallas TPU kernels for the four-step NTT hot path.

The XLA-composed path (ops/ntt_large.py) materializes every int8 partial dot
in HBM and folds diagonals with emulated-u64 Montgomery passes; this module
fuses one whole NTT *stage* into a single Mosaic kernel:

    load u64 tile (as u32 lo/hi pair planes)
      -> 7-bit digit split (VPU shifts)
      -> c^2 int8 x int8 -> int32 dots on the MXU
      -> diagonal accumulation and radix-2^7 group packing (u32-pair adds)
      -> one Montgomery REDC per group + optional twiddle REDC
    store u64 tile

so HBM traffic collapses to one read + one write of the residue data per
stage.  Mosaic has no 64-bit integers: all modular arithmetic here is
32-bit-limb (16-bit-split wide multiplies), i.e. the Montgomery/Barrett-
on-u32-lanes design the BASELINE north star prescribes.

The negacyclic psi twists fold into the stage tables for free:
    psi^(i1*n2 + i2) = psi^(i1*n2) (into T1's i1 column)  *  psi^(i2) (into
    the inter-stage twiddle's i2 row), and symmetrically for the inverse.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import MontConsts
from .ntt_large import FourStepPlan, _find_generator

U32 = jnp.uint32
_M16 = np.uint32(0xFFFF)
_S16 = np.uint32(16)
CHUNK_BITS = 7


# ---------------------------------------------------------------------------
# u32-pair (64-bit) arithmetic for Mosaic (no i64 on TPU vector units)
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


def _add64(ah, al, bh, bl):
    l = al + bl
    h = ah + bh + (l < al).astype(U32)
    return h, l


def _mul64_full(ah, al, bh, bl):
    """64x64 -> 128-bit as four u32 words (p3, p2, p1, p0)."""
    h0, l0 = _wide_mul(al, bl)
    h1, l1 = _wide_mul(al, bh)
    h2, l2 = _wide_mul(ah, bl)
    h3, l3 = _wide_mul(ah, bh)
    p0 = l0
    p1 = h0 + l1
    c = (p1 < h0).astype(U32)
    p1b = p1 + l2
    c = c + (p1b < p1).astype(U32)
    p2 = h1 + h2
    c2 = (p2 < h1).astype(U32)
    p2b = p2 + l3
    c2 = c2 + (p2b < p2).astype(U32)
    p2c = p2b + c
    c2 = c2 + (p2c < p2b).astype(U32)
    p3 = h3 + c2
    return p3, p2c, p1b, p0


def _mullo64(ah, al, bh, bl):
    """Low 64 bits of the product."""
    h0, l0 = _wide_mul(al, bl)
    return h0 + al * bh + ah * bl, l0


def _mont_mul_pair(ah, al, bh, bl, qh, ql, qih, qil):
    """Montgomery a*b*R^-1 mod q on u32 pairs; requires a*b < q*2^64."""
    t3, t2, t1, t0 = _mul64_full(ah, al, bh, bl)
    mh, ml = _mullo64(t1, t0, qih, qil)
    u3, u2, _, _ = _mul64_full(mh, ml, qh, ql)
    lo_nz = ((t1 | t0) != 0).astype(U32)
    rh, rl = _add64(t3, t2, u3, u2)
    rl2 = rl + lo_nz
    rh = rh + (rl2 < rl).astype(U32)
    ge = (rh > qh) | ((rh == qh) & (rl2 >= ql))
    borrow = (rl2 < ql).astype(U32)
    rh2 = rh - qh - borrow
    rl3 = rl2 - ql
    return jnp.where(ge, rh2, rh), jnp.where(ge, rl3, rl2)


def _add_mod_pair(ah, al, bh, bl, qh, ql):
    sh, sl = _add64(ah, al, bh, bl)  # both < q < 2^63: no 64-bit overflow
    ge = (sh > qh) | ((sh == qh) & (sl >= ql))
    borrow = (sl < ql).astype(U32)
    return (jnp.where(ge, sh - qh - borrow, sh),
            jnp.where(ge, sl - ql, sl))


def _digit(lo, hi, s):
    """7-bit digit at bit offset s of the (hi, lo) 64-bit value (s static)."""
    m = np.uint32(127)
    if s + CHUNK_BITS <= 32:
        return ((lo >> np.uint32(s)) & m) if s else (lo & m)
    if s >= 32:
        return (hi >> np.uint32(s - 32)) & m
    return ((lo >> np.uint32(s)) | (hi << np.uint32(32 - s))) & m


# ---------------------------------------------------------------------------
# The fused stage kernel
# ---------------------------------------------------------------------------

def _stage_kernel(dlo_ref, dhi_ref, tch_ref, twlo_ref, twhi_ref,
                  sc_ref, p2r_ref, olo_ref, ohi_ref,
                  *, chunks: int, per_group: int, with_twiddle: bool,
                  side: str = "right"):
    ql = sc_ref[0, 0, 0]
    qh = sc_ref[0, 0, 1]
    qil = sc_ref[0, 0, 2]
    qih = sc_ref[0, 0, 3]
    lo = dlo_ref[0]
    hi = dhi_ref[0]
    n_diag = 2 * chunks - 1

    # digit planes (int8) once
    digits = [_digit(lo, hi, CHUNK_BITS * j).astype(jnp.int8)
              for j in range(chunks)]

    out_h = None
    out_l = None
    g_idx = 0
    for g0 in range(0, n_diag, per_group):
        gh = None
        gl = None
        for s in range(g0, min(g0 + per_group, n_diag)):
            diag = None
            for i in range(max(0, s - chunks + 1), min(chunks, s + 1)):
                j = s - i
                if side == "right":
                    # out[r, k] = sum_x D[r, x] T[k, x]
                    p = jax.lax.dot_general(
                        digits[j], tch_ref[0, i],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    # out[w, m] = sum_r T[w, r] D[r, m]
                    p = jax.lax.dot_general(
                        tch_ref[0, i], digits[j],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                diag = p if diag is None else diag + p
            d = diag.astype(U32)
            shift = CHUNK_BITS * (s - g0)
            if shift == 0:
                vh, vl = jnp.zeros_like(d), d
            elif shift < 32:
                vh = d >> np.uint32(32 - shift)
                vl = d << np.uint32(shift)
            else:
                vh = d << np.uint32(shift - 32)
                vl = jnp.zeros_like(d)
            if gh is None:
                gh, gl = vh, vl
            else:
                gh, gl = _add64(gh, gl, vh, vl)
        if with_twiddle:
            # twiddle folded into the per-group radix table:
            # m_g[el] = tw[el] * 2^(7*g0) * R mod q  (twlo/twhi input tiles
            # carry group g at channel slot g)
            mh = twhi_ref[0, g_idx]
            ml = twlo_ref[0, g_idx]
        else:
            mh = p2r_ref[0, 0, 2 * g_idx + 1]
            ml = p2r_ref[0, 0, 2 * g_idx]
        th, tl = _mont_mul_pair(gh, gl, mh, ml, qh, ql, qih, qil)
        if out_h is None:
            out_h, out_l = th, tl
        else:
            out_h, out_l = _add_mod_pair(out_h, out_l, th, tl, qh, ql)
        g_idx += 1

    olo_ref[0] = out_l
    ohi_ref[0] = out_h


class PallasStage:
    """One fused modular-matmul stage.

    side='right': out[l, r, k] = sum_x D[l, r, x] T[l, k, x] mod q, tiled over
                  rows r; optional per-(r mod tw_rows, k) twiddle (NTT stages).
    side='left':  out[l, w, m] = sum_r T[l, w, r] D[l, r, m] mod q, tiled over
                  columns m (the W-CRT transform orientation, HE.cu:716-781).
    """

    def __init__(self, tables_u64: np.ndarray, moduli,
                 twiddle_mont: Optional[np.ndarray] = None,
                 row_tile: int = 256, side: str = "right"):
        L, W, K = tables_u64.shape
        assert side in ("right", "left")
        if side == "left":
            assert twiddle_mont is None, "twiddle only supported on 'right'"
        else:
            assert W == K
        self.side = side
        self.L, self.k = L, K
        self.w = W
        self.row_tile = row_tile
        bits = max(int(q).bit_length() for q in moduli)
        self.chunks = -(-bits // CHUNK_BITS)
        n_diag = 2 * self.chunks - 1
        # diag bound: K * 127^2 * min-chunk-overlap; keep packed group < 2^63
        diag_bits = (K * (127 ** 2) * self.chunks).bit_length()
        self.per_group = max(1, (62 - diag_bits) // CHUNK_BITS + 1)
        self.n_groups = -(-n_diag // self.per_group)

        # pre-chunked tables [L, C, W, K] int8 (W == K for 'right')
        tch = np.empty((L, self.chunks, W, K), dtype=np.int8)
        for c in range(self.chunks):
            tch[:, c] = ((tables_u64 >> np.uint64(CHUNK_BITS * c))
                         & np.uint64(127)).astype(np.int8)
        self._tch = jnp.asarray(tch)

        # scalar consts [L, 4]: q_lo, q_hi, qinv_lo, qinv_hi
        sc = np.empty((L, 4), dtype=np.uint32)
        p2r = np.empty((L, self.n_groups, 2), dtype=np.uint32)
        for l, q in enumerate(moduli):
            mc = MontConsts.make(int(q))
            sc[l] = (q & 0xFFFFFFFF, q >> 32,
                     mc.qinv_neg & 0xFFFFFFFF, mc.qinv_neg >> 32)
            for g in range(self.n_groups):
                s0 = g * self.per_group
                v = (1 << (CHUNK_BITS * s0)) * mc.r_mod % q
                p2r[l, g] = (v & 0xFFFFFFFF, v >> 32)
        self._sc = jnp.asarray(sc.reshape(L, 1, 4))
        self._p2r = jnp.asarray(p2r.reshape(L, 1, 2 * self.n_groups))

        self.with_twiddle = twiddle_mont is not None
        if self.with_twiddle:
            # fold each group's radix constant into the twiddle table:
            # m_g = tw * 2^(7 * g0) * R mod q   -> [L, G, rows, K] u32 pairs
            self.tw_rows = twiddle_mont.shape[1]
            G = self.n_groups
            m = np.empty((L, G) + twiddle_mont.shape[1:], dtype=np.uint64)
            for l, q in enumerate(moduli):
                base = twiddle_mont[l].astype(object)  # tw * R mod q
                for g in range(G):
                    p2 = pow(2, CHUNK_BITS * g * self.per_group, int(q))
                    m[l, g] = (base * p2 % int(q)).astype(np.uint64)
            self._twlo = jnp.asarray((m & np.uint64(0xFFFFFFFF))
                                     .astype(np.uint32))
            self._twhi = jnp.asarray((m >> np.uint64(32)).astype(np.uint32))
        else:
            # unused placeholder blocks (kernel never reads them)
            self.tw_rows = 0
            self._twlo = jnp.zeros((L, 1, 1, 1), jnp.uint32)
            self._twhi = jnp.zeros((L, 1, 1, 1), jnp.uint32)

    @functools.lru_cache(maxsize=8)
    def _call(self, rows: int, TR: int):
        L, K = self.L, self.k
        kern = functools.partial(
            _stage_kernel, chunks=self.chunks, per_group=self.per_group,
            with_twiddle=self.with_twiddle, side=self.side)
        tch_spec = pl.BlockSpec((1, self.chunks, self.w, K),
                                lambda l, r: (l, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 4), lambda l, r: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        p2r_spec = pl.BlockSpec((1, 1, 2 * self.n_groups),
                                lambda l, r: (l, 0, 0),
                                memory_space=pltpu.SMEM)
        assert rows % TR == 0
        grid = (L, rows // TR)
        if self.side == "right":
            data_spec = pl.BlockSpec((1, TR, K), lambda l, r: (l, r, 0),
                                     memory_space=pltpu.VMEM)
            out_spec = data_spec
            out_shape = (L, rows, K)
            if self.with_twiddle:
                assert self.tw_rows % TR == 0
                tiles_per_tw = self.tw_rows // TR
                tw_spec = pl.BlockSpec(
                    (1, self.n_groups, TR, K),
                    lambda l, r: (l, 0, r % tiles_per_tw, 0),
                    memory_space=pltpu.VMEM)
            else:
                tw_spec = pl.BlockSpec((1, 1, 1, 1),
                                       lambda l, r: (l, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
        else:
            # rows == number of data columns M here; tile over M
            data_spec = pl.BlockSpec((1, K, TR), lambda l, m: (l, 0, m),
                                     memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((1, self.w, TR), lambda l, m: (l, 0, m),
                                    memory_space=pltpu.VMEM)
            out_shape = (L, self.w, rows)
            tw_spec = pl.BlockSpec((1, 1, 1, 1), lambda l, m: (l, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[data_spec, data_spec, tch_spec, tw_spec, tw_spec,
                      sc_spec, p2r_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct(out_shape, jnp.uint32),
                       jax.ShapeDtypeStruct(out_shape, jnp.uint32)),
            interpret=jax.default_backend() == "cpu",
        )

    def __call__(self, d_lo: jnp.ndarray, d_hi: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """side='right': d_lo/d_hi [L, R, K] uint32, tiled over R.
        side='left':  d_lo/d_hi [L, R(=K), M] uint32, tiled over M."""
        rows = d_lo.shape[1] if self.side == "right" else d_lo.shape[2]
        TR = min(self.row_tile, rows)
        while rows % TR:
            TR //= 2
        call = self._call(rows, TR)
        twl, twh = self._twlo, self._twhi
        # Mosaic cannot legalize the i64 index/return types that
        # jax_enable_x64 injects into gridded pallas_calls; trace the kernel
        # in 32-bit mode (all operands are explicitly u32/int8 anyway).
        with jax.enable_x64(False):
            return call(d_lo, d_hi, self._tch, twl, twh,
                        self._sc, self._p2r)


def split_u64(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return ((x & np.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (x >> np.uint64(32)).astype(jnp.uint32))


def join_u64(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))


class PallasFourStepNTT:
    """Drop-in four-step negacyclic NTT with both stages as fused Pallas
    kernels; twists folded into the tables.  Output order and values are
    bit-identical to ops.ntt_large.FourStepNTT."""

    def __init__(self, plan: FourStepPlan, row_tile: int = 256):
        if plan.n1 != plan.n2:
            raise ValueError("PallasFourStepNTT requires n1 == n2")
        self.plan = plan
        n, n1, n2 = plan.n, plan.n1, plan.n2
        L = len(plan.moduli)
        t1f = np.empty((L, n1, n1), dtype=np.uint64)   # [k1, i1] * psi^(i1 n2)
        t2f = np.empty((L, n2, n2), dtype=np.uint64)   # [k2, i2]
        t1i = np.empty((L, n1, n1), dtype=np.uint64)   # [i1, k1] * psi^-(i1 n2) / n
        t2i = np.empty((L, n2, n2), dtype=np.uint64)   # [i2, k2]
        twf = np.empty((L, n2, n1), dtype=np.uint64)   # [i2, k1] * psi^(i2), mont
        twi = np.empty((L, n1, n2), dtype=np.uint64)   # [k1, i2] * psi^-(i2), mont
        for l, q in enumerate(plan.moduli):
            g = _find_generator(q)
            w_n = pow(g, (q - 1) // n, q)
            w1 = pow(w_n, n2, q)
            n_inv = pow(n, q - 2, q)
            r_mod = (1 << 64) % q
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
                    twf[l, i2, k1] = pow(w_n, i2 * k1 % n, q) * p2 % q * r_mod % q
                    twi[l, k1, i2] = pow(w_inv, i2 * k1 % n, q) * p2i % q * r_mod % q
        mods = plan.moduli
        self._s1f = PallasStage(t1f, mods, twiddle_mont=twf, row_tile=row_tile)
        self._s2f = PallasStage(t2f, mods, row_tile=row_tile)
        self._s2i = PallasStage(t2i, mods, twiddle_mont=twi, row_tile=row_tile)
        self._s1i = PallasStage(t1i, mods, row_tile=row_tile)

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """[L, B, N] u64 -> four-step-order spectrum."""
        p = self.plan
        L, B = x.shape[0], x.shape[1]
        x4 = x.reshape(L, B, p.n1, p.n2)
        xt = jnp.swapaxes(x4, 2, 3).reshape(L, B * p.n2, p.n1)  # rows (b, i2)
        lo, hi = split_u64(xt)
        lo, hi = self._s1f(lo, hi)                               # cols k1
        y = join_u64(lo, hi).reshape(L, B, p.n2, p.n1)
        yt = jnp.swapaxes(y, 2, 3).reshape(L, B * p.n1, p.n2)    # rows (b, k1)
        lo, hi = split_u64(yt)
        lo, hi = self._s2f(lo, hi)                               # cols k2
        return join_u64(lo, hi).reshape(L, B, p.n)

    def inverse(self, xf: jnp.ndarray) -> jnp.ndarray:
        p = self.plan
        L, B = xf.shape[0], xf.shape[1]
        z = xf.reshape(L, B * p.n1, p.n2)                        # rows (b, k1)
        lo, hi = split_u64(z)
        lo, hi = self._s2i(lo, hi)                               # cols i2 (+tw)
        y = join_u64(lo, hi).reshape(L, B, p.n1, p.n2)
        yt = jnp.swapaxes(y, 2, 3).reshape(L, B * p.n2, p.n1)    # rows (b, i2)
        lo, hi = split_u64(yt)
        lo, hi = self._s1i(lo, hi)                               # cols i1
        out = join_u64(lo, hi).reshape(L, B, p.n2, p.n1)
        return jnp.swapaxes(out, 2, 3).reshape(L, B, p.n)
