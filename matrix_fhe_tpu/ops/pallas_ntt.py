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
# The fused stage kernel
# ---------------------------------------------------------------------------

def _stage_kernel(dlo_ref, dhi_ref, tch_ref, twlo_ref, twhi_ref,
                  sc_ref, olo_ref, ohi_ref,
                  *, chunks: int, with_twiddle: bool, side: str,
                  pair_pack: bool, lead: int):
    ql = sc_ref[0, 0, 0]
    qh = sc_ref[0, 0, 1]
    qil = sc_ref[0, 0, 2]
    qih = sc_ref[0, 0, 3]
    idx = (0,) * lead
    lo = dlo_ref[idx]
    hi = dhi_ref[idx]
    n_diag = 2 * chunks - 1

    digits = [_digit(lo, hi, CHUNK_BITS * j).astype(jnp.int8)
              for j in range(chunks)]

    diags = []
    for s in range(n_diag):
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
        diags.append(diag.astype(U32))

    # pack the diagonal values (exact integer S = v * R < 2^99) into four
    # u32 words; adjacent diagonals pair into one u32 when the bound allows
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
    t0, t1, t2, t3 = _sum_words(parts, diags[0])

    rh, rl = _redc(t3, t2, t1, t0, qh, ql, qih, qil)
    if with_twiddle:
        twl = twlo_ref[idx]
        twh = twhi_ref[idx]
        rh, rl = _montmul48(rh, rl, twh, twl, qh, ql, qih, qil)

    olo_ref[idx] = rl
    ohi_ref[idx] = rh


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
        n_diag = 2 * self.chunks - 1
        # pairing bound: (max diagonal value) * (2^7 + 1) must fit in u32
        max_diag = K * (127 ** 2) * self.chunks
        self.pair_pack = max_diag * ((1 << CHUNK_BITS) + 1) < (1 << 32)
        # packed integer is exactly sum_x D[x]*(T*R mod q)[x] < K * q^2;
        # REDC needs < R*q = q * 2^64
        assert K < (1 << 64) // (1 << bits), "K*q^2 exceeds the REDC domain"

        # digit-split Montgomery-domain tables [L, C, W, K] int8
        tmont = np.empty_like(tables_u64)
        for l, q in enumerate(moduli):
            q = int(q)
            r_mod = (1 << 64) % q
            tmont[l] = (tables_u64[l].astype(object) * r_mod % q
                        ).astype(np.uint64)
        tch = np.empty((L, self.chunks, W, K), dtype=np.int8)
        for c in range(self.chunks):
            tch[:, c] = ((tmont >> np.uint64(CHUNK_BITS * c))
                         & np.uint64(127)).astype(np.int8)
        self._tch = jnp.asarray(tch)

        # scalar consts [L, 4]: q_lo, q_hi, qinv_lo, qinv_hi
        sc = np.empty((L, 4), dtype=np.uint32)
        for l, q in enumerate(moduli):
            mc = MontConsts.make(int(q))
            sc[l] = (q & 0xFFFFFFFF, q >> 32,
                     mc.qinv_neg & 0xFFFFFFFF, mc.qinv_neg >> 32)
        self._sc = jnp.asarray(sc.reshape(L, 1, 4))

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
        kern = functools.partial(
            _stage_kernel, chunks=self.chunks, with_twiddle=self.with_twiddle,
            side="right" if self.side == "right" else "left",
            pair_pack=self.pair_pack, lead=lead)
        assert rows % tile == 0
        nt = rows // tile
        tw_placeholder = pl.BlockSpec((1,) * (lead + 2), lambda *a: (0,) * (lead + 2),
                                      memory_space=pltpu.VMEM)
        if self.side == "right":
            grid = (L, nt)
            tch_spec = pl.BlockSpec((1, self.chunks, self.w, K),
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
            tch_spec = pl.BlockSpec((1, self.chunks, self.w, K),
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
            tch_spec = pl.BlockSpec((1, self.chunks, self.w, K),
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
            interpret=jax.default_backend() == "cpu",
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
        L = len(plan.moduli)
        t1f = np.empty((L, n1, n1), dtype=np.uint64)   # [k1, i1] * psi^(i1 n2)
        t2f = np.empty((L, n2, n2), dtype=np.uint64)   # [k2, i2]
        t1i = np.empty((L, n1, n1), dtype=np.uint64)   # [i1, k1] * psi^-(i1 n2) / n
        t2i = np.empty((L, n2, n2), dtype=np.uint64)   # [i2, k2]
        twf = np.empty((L, n1, n2), dtype=np.uint64)   # [k1, i2] * psi^(i2), mont
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
                    twf[l, k1, i2] = pow(w_n, i2 * k1 % n, q) * p2 % q * r_mod % q
                    twi[l, k1, i2] = pow(w_inv, i2 * k1 % n, q) * p2i % q * r_mod % q
        mods = plan.moduli
        self._s1f = PallasStage(t1f, mods, twiddle_mont=twf,
                                row_tile=row_tile, side="batched_left")
        self._s2f = PallasStage(t2f, mods, row_tile=row_tile)
        self._s2i = PallasStage(t2i, mods, twiddle_mont=twi,
                                row_tile=row_tile)
        self._s1i = PallasStage(t1i, mods, row_tile=row_tile,
                                side="batched_left")

    def forward_pair(self, lo: jnp.ndarray, hi: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[L, B, N] u32 lo/hi planes -> four-step-order spectrum planes."""
        p = self.plan
        L, B = lo.shape[0], lo.shape[1]
        lo4 = lo.reshape(L, B, p.n1, p.n2)
        hi4 = hi.reshape(L, B, p.n1, p.n2)
        lo4, hi4 = self._s1f(lo4, hi4)                       # [L,B,k1,i2] * tw
        lo2 = lo4.reshape(L, B * p.n1, p.n2)
        hi2 = hi4.reshape(L, B * p.n1, p.n2)
        lo2, hi2 = self._s2f(lo2, hi2)                       # cols k2
        return (lo2.reshape(L, B, p.n), hi2.reshape(L, B, p.n))

    def inverse_pair(self, lo: jnp.ndarray, hi: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p = self.plan
        L, B = lo.shape[0], lo.shape[1]
        lo2 = lo.reshape(L, B * p.n1, p.n2)
        hi2 = hi.reshape(L, B * p.n1, p.n2)
        lo2, hi2 = self._s2i(lo2, hi2)                       # cols i2, * tw
        lo4 = lo2.reshape(L, B, p.n1, p.n2)
        hi4 = hi2.reshape(L, B, p.n1, p.n2)
        lo4, hi4 = self._s1i(lo4, hi4)                       # rows i1
        return (lo4.reshape(L, B, p.n), hi4.reshape(L, B, p.n))

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """[L, B, N] u64 -> four-step-order spectrum (u64 wrapper)."""
        return join_u64(*self.forward_pair(*split_u64(x)))

    def inverse(self, xf: jnp.ndarray) -> jnp.ndarray:
        return join_u64(*self.inverse_pair(*split_u64(xf)))
