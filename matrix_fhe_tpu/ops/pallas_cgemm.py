"""Fused batched complex modular GEMM for the homomorphic trace op.

The trace-GEMM (C = n * A @ B'^T per packed lane, trace.cu:77-131 /
batched_trace.cu:99-158) is a batch of 512 x L tiny [n x n x n] complex
modular matmuls.  The XLA-composed chunked path materializes every digit
product in HBM and runs at well under 1% of the int8 MXU roof; this kernel
fuses one (limb, lane-block) tile end to end:

    load A, B (u32 lo/hi pairs, complex as separate re/im planes)
      -> B pre-reduced per data-digit j: B_j = B * (n * 2^(28+7j)) * 2^-32
         (one Montgomery multiply per element per j; amortized over the
         whole contraction)
      -> A digit planes concat along the contraction axis
      -> chunks_t int8 MXU dots per real GEMM (4 per complex GEMM)
      -> R = 2^28 sliced fold (same machinery as the NTT kernels)
    store C (complex pair)

The trace's *n scale is folded into the B_j constants, so the kernel
computes exactly n * A @ B^T mod q, canonically, bit-identical to
trace_gemm's XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _backend
from .modmath import MontConsts
from .pallas_ntt import (CHUNK_BITS, _data_digits, _fold_redc28,
                         _montmul48, _sliced_params, U32,
                         split_u64, join_u64)


def _cgemm_kernel(arl_ref, arh_ref, ail_ref, aih_ref,
                  brl_ref, brh_ref, bil_ref, bih_ref,
                  sc_ref, cj_ref,
                  crl_ref, crh_ref, cil_ref, cih_ref,
                  *, wb: int, n: int, chunks_d: int, chunks_t: int,
                  bits: int):
    import os as _os
    _abl = _os.environ.get("MFHE_CGEMM_ABLATE", "")
    ql, qh = sc_ref[0, 0, 0], sc_ref[0, 0, 1]
    qil, qih = sc_ref[0, 0, 2], sc_ref[0, 0, 4]
    qi28 = sc_ref[0, 0, 3]
    rows = wb * n
    if _abl == "io":
        crl_ref[0] = arl_ref[0]
        crh_ref[0] = arh_ref[0]
        cil_ref[0] = brl_ref[0]
        cih_ref[0] = brh_ref[0]
        return
    # every phase except the dots is elementwise: run them LANE-MERGED on
    # [wb*n, n] views (per-lane [64, 64] op streams replicate each vector
    # instruction wb times); the dots slice per-lane rows out of the merged
    # digit planes (sublane slices, cheap)
    arl = arl_ref[0].reshape(rows, n)
    arh = arh_ref[0].reshape(rows, n)
    ail = ail_ref[0].reshape(rows, n)
    aih = aih_ref[0].reshape(rows, n)

    acat_r = _data_digits(arl, arh, chunks_d, 1)      # [rows, cd*n]
    acat_i = _data_digits(ail, aih, chunks_d, 1)

    def bcat(bl, bh):
        pieces = [[] for _ in range(chunks_t)]
        for j in range(chunks_d):
            cl = cj_ref[0, 0, 2 * j]
            ch = cj_ref[0, 0, 2 * j + 1]
            tjh, tjl = _montmul48(bh, bl, ch, cl, qh, ql, qih, qil)
            for c in range(chunks_t):
                s = CHUNK_BITS * c
                if s + CHUNK_BITS <= 32:
                    d = ((tjl >> np.uint32(s)) & np.uint32(127)
                         ) if s else (tjl & np.uint32(127))
                elif s >= 32:
                    d = (tjh >> np.uint32(s - 32)) & np.uint32(127)
                else:
                    d = ((tjl >> np.uint32(s))
                         | (tjh << np.uint32(32 - s))) & np.uint32(127)
                pieces[c].append(d.astype(jnp.int8))
        return [jnp.concatenate(p, axis=1) for p in pieces]

    if _abl == "acat":
        z = (acat_r.astype(jnp.int32)[:, :n] + acat_i.astype(jnp.int32)[:, :n]
             ).astype(jnp.uint32).reshape(wb, n, n)
        crl_ref[0] = z
        crh_ref[0] = z
        cil_ref[0] = z
        cih_ref[0] = z
        return
    tbr = bcat(brl_ref[0].reshape(rows, n), brh_ref[0].reshape(rows, n))
    tbi = bcat(bil_ref[0].reshape(rows, n), bih_ref[0].reshape(rows, n))
    if _abl == "bprep":
        z = (tbr[0].astype(jnp.int32)[:, :n] + tbi[0].astype(jnp.int32)[:, :n]
             ).astype(jnp.uint32).reshape(wb, n, n)
        crl_ref[0] = z
        crh_ref[0] = z
        cil_ref[0] = z
        cih_ref[0] = z
        return

    def gemm(acat, tb):
        # per-lane dots (each lane contracts against its own B table),
        # merged diagonals, ONE fold
        diags = []
        for c in range(chunks_t):
            per_lane = [jax.lax.dot_general(
                acat[w * n:(w + 1) * n], tb[c][w * n:(w + 1) * n],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32) for w in range(wb)]
            diags.append(per_lane[0] if wb == 1
                         else jnp.concatenate(per_lane, axis=0))
        return _fold_redc28(diags, qh, ql, qi28,
                            diag_bound=chunks_d * n * 127 * 127,
                            bits=bits)

    def gemm4_merged():
        """All four real GEMMs of the complex product in ONE dot per lane:
        rows = [Ar; Ai] (2n), columns = every (digit plane c) x (Br | Bi)
        table slice (2*chunks_t*n) — 8x fewer, 20x bigger MXU issues than
        the per-(part, plane, lane) form (the measured 2.6x scheduling
        residual of round 2 was per-dot fixed overhead, not data
        movement).  Bit-identical: each output element is the same single
        i32 dot product, just batched."""
        rr_d = [[] for _ in range(chunks_t)]
        ri_d = [[] for _ in range(chunks_t)]
        ir_d = [[] for _ in range(chunks_t)]
        ii_d = [[] for _ in range(chunks_t)]
        for w in range(wb):
            sl = slice(w * n, (w + 1) * n)
            a2 = jnp.concatenate([acat_r[sl], acat_i[sl]], axis=0)
            tb_all = jnp.concatenate(
                [tbr[c][sl] for c in range(chunks_t)]
                + [tbi[c][sl] for c in range(chunks_t)], axis=0)
            res = jax.lax.dot_general(a2, tb_all, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            for c in range(chunks_t):
                rr_d[c].append(res[:n, c * n:(c + 1) * n])
                ri_d[c].append(res[:n, (chunks_t + c) * n:
                                    (chunks_t + c + 1) * n])
                ir_d[c].append(res[n:, c * n:(c + 1) * n])
                ii_d[c].append(res[n:, (chunks_t + c) * n:
                                    (chunks_t + c + 1) * n])

        def fold(dlists):
            diags = [d[0] if wb == 1 else jnp.concatenate(d, axis=0)
                     for d in dlists]
            return _fold_redc28(diags, qh, ql, qi28,
                                diag_bound=chunks_d * n * 127 * 127,
                                bits=bits)

        return fold(rr_d), fold(ii_d), fold(ri_d), fold(ir_d)

    if _abl == "dots1":
        rr_h, rr_l = gemm(acat_r, tbr)
        crl_ref[0] = rr_l.reshape(wb, n, n)
        crh_ref[0] = rr_h.reshape(wb, n, n)
        cil_ref[0] = rr_l.reshape(wb, n, n)
        cih_ref[0] = rr_h.reshape(wb, n, n)
        return
    if _os.environ.get("MFHE_CGEMM_SPLIT") == "1":   # round-2 form
        rr_h, rr_l = gemm(acat_r, tbr)     # Ar @ Br
        ii_h, ii_l = gemm(acat_i, tbi)     # Ai @ Bi
        ri_h, ri_l = gemm(acat_r, tbi)     # Ar @ Bi
        ir_h, ir_l = gemm(acat_i, tbr)     # Ai @ Br
    else:
        ((rr_h, rr_l), (ii_h, ii_l),
         (ri_h, ri_l), (ir_h, ir_l)) = gemm4_merged()
    # C_re = rr - ii, C_im = ri + ir  (canonical mod-q add/sub on pairs)
    bl = rr_l - ii_l
    bb = (rr_l < ii_l).astype(U32)
    bh = rr_h - ii_h - bb
    neg = (rr_h < ii_h) | ((rr_h == ii_h) & (rr_l < ii_l))
    al = bl + ql
    ac = (al < bl).astype(U32)
    crl_ref[0] = jnp.where(neg, al, bl).reshape(wb, n, n)
    crh_ref[0] = jnp.where(neg, bh + qh + ac, bh).reshape(wb, n, n)
    sl = ri_l + ir_l
    sc_ = (sl < ir_l).astype(U32)
    sh = ri_h + ir_h + sc_
    ge = (sh > qh) | ((sh == qh) & (sl >= ql))
    borrow = (sl < ql).astype(U32)
    cil_ref[0] = jnp.where(ge, sl - ql, sl).reshape(wb, n, n)
    cih_ref[0] = jnp.where(ge, sh - qh - borrow, sh).reshape(wb, n, n)


class SlicedCGemm:
    """C = scale * A @ B^T (complex, modular, contraction over the last
    axis of both) for [L, W, n, n] re/im u64 operands, one limb run."""

    def __init__(self, moduli, n: int, scale: int = 1, wb: int = 8):
        self.moduli = tuple(int(q) for q in moduli)
        self.n = n
        self.bits = max(q.bit_length() for q in self.moduli)
        assert self.bits < 48
        self.chunks_d = -(-self.bits // CHUNK_BITS)
        self.chunks_t = self.chunks_d
        self.wb = wb
        L = len(self.moduli)
        cj = np.zeros((L, 1, 2 * self.chunks_d), dtype=np.uint32)
        for l, q in enumerate(self.moduli):
            for j in range(self.chunks_d):
                # montmul48(B, cj) = B*cj*2^-64 must equal B*scale*2^(28+7j)
                c = (scale % q) * pow(2, 28 + CHUNK_BITS * j + 64, q) % q
                cj[l, 0, 2 * j] = c & 0xFFFFFFFF
                cj[l, 0, 2 * j + 1] = c >> 32
        self._cj = jnp.asarray(cj)
        sc = np.empty((L, 1, 5), dtype=np.uint32)
        for l, q in enumerate(self.moduli):
            mc = MontConsts.make(q)
            sc[l] = (q & 0xFFFFFFFF, q >> 32,
                     mc.qinv_neg & 0xFFFFFFFF, mc.qinv_neg & 0x0FFFFFFF,
                     mc.qinv_neg >> 32)
        self._sc = jnp.asarray(sc)

    @functools.lru_cache(maxsize=4)
    def _call(self, W: int, wb: int):
        L, n = len(self.moduli), self.n
        kern = functools.partial(
            _cgemm_kernel, wb=wb, n=n, chunks_d=self.chunks_d,
            chunks_t=self.chunks_t, bits=self.bits)
        spec = pl.BlockSpec((1, wb, n, n), lambda l, w: (l, w, 0, 0),
                            memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 5), lambda l, w: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        cj_spec = pl.BlockSpec((1, 1, 2 * self.chunks_d),
                               lambda l, w: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        sh = jax.ShapeDtypeStruct((L, W, n, n), jnp.uint32)
        return pl.pallas_call(
            kern,
            grid=(L, W // wb),
            in_specs=[spec] * 8 + [sc_spec, cj_spec],
            out_specs=(spec,) * 4,
            out_shape=(sh,) * 4,
            interpret=_backend.pallas_interpret_default(),
            compiler_params=_sliced_params(2),
        )

    def __call__(self, a_re, a_im, b_re, b_im
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """u64 [L, W, n, n] complex operands -> (c_re, c_im) u64."""
        W = a_re.shape[1]
        wb = self.wb
        while W % wb:
            wb //= 2
        arl, arh = split_u64(a_re)
        ail, aih = split_u64(a_im)
        brl, brh = split_u64(b_re)
        bil, bih = split_u64(b_im)
        call = self._call(W, wb)
        with jax.enable_x64(False):
            crl, crh, cil, cih = call(arl, arh, ail, aih,
                                      brl, brh, bil, bih,
                                      self._sc, self._cj)
        return join_u64(crl, crh), join_u64(cil, cih)


def _gemm2x2_kernel(u1l_ref, u1h_ref, u2l_ref, u2h_ref,
                    v1l_ref, v1h_ref, v2l_ref, v2h_ref,
                    sc_ref, cj_ref,
                    e00l_ref, e00h_ref, e01l_ref, e01h_ref,
                    e10l_ref, e10h_ref, e11l_ref, e11h_ref,
                    *, wb: int, y: int, m: int, chunks_d: int,
                    chunks_t: int, bits: int):
    """All four products of the 2x2 GEMM tensor
    E_ij[a, b] = scale * sum_y U_i[y, a] * V_j[y, b] mod q
    in ONE merged MXU dot per lane: rows = [U1 | U2] digit planes
    (concat along columns), columns = every (digit plane c) x (V1 | V2)
    pre-reduced table slice — the gl2 GEMM tensor op (he_matmul2.tensor_fn,
    batched_trace.cu:99-158 analog on the doubled ring)."""
    ql, qh = sc_ref[0, 0, 0], sc_ref[0, 0, 1]
    qil, qih = sc_ref[0, 0, 2], sc_ref[0, 0, 4]
    qi28 = sc_ref[0, 0, 3]

    def bcat(bl, bh):
        # V pre-reduced per data digit j (montmul by scale*2^(28+7j)),
        # split into table digit planes, concat along the contraction axis
        pieces = [[] for _ in range(chunks_t)]
        for j in range(chunks_d):
            cl = cj_ref[0, 0, 2 * j]
            ch = cj_ref[0, 0, 2 * j + 1]
            tjh, tjl = _montmul48(bh, bl, ch, cl, qh, ql, qih, qil)
            for c in range(chunks_t):
                s = CHUNK_BITS * c
                if s + CHUNK_BITS <= 32:
                    d = ((tjl >> np.uint32(s)) & np.uint32(127)
                         ) if s else (tjl & np.uint32(127))
                elif s >= 32:
                    d = (tjh >> np.uint32(s - 32)) & np.uint32(127)
                else:
                    d = ((tjl >> np.uint32(s))
                         | (tjh << np.uint32(32 - s))) & np.uint32(127)
                pieces[c].append(d.astype(jnp.int8))
        return [jnp.concatenate(p, axis=0) for p in pieces]

    d00 = [[] for _ in range(chunks_t)]
    d01 = [[] for _ in range(chunks_t)]
    d10 = [[] for _ in range(chunks_t)]
    d11 = [[] for _ in range(chunks_t)]
    for w in range(wb):
        a1 = _data_digits(u1l_ref[0, w], u1h_ref[0, w], chunks_d, 0)
        a2 = _data_digits(u2l_ref[0, w], u2h_ref[0, w], chunks_d, 0)
        lhs = jnp.concatenate([a1, a2], axis=1)        # [cd*y, 2m]
        tb1 = bcat(v1l_ref[0, w], v1h_ref[0, w])
        tb2 = bcat(v2l_ref[0, w], v2h_ref[0, w])
        rhs = jnp.concatenate(tb1 + tb2, axis=1)       # [cd*y, 2*ct*m]
        res = jax.lax.dot_general(lhs, rhs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        for c in range(chunks_t):
            d00[c].append(res[:m, c * m:(c + 1) * m])
            d01[c].append(res[:m, (chunks_t + c) * m:(chunks_t + c + 1) * m])
            d10[c].append(res[m:, c * m:(c + 1) * m])
            d11[c].append(res[m:, (chunks_t + c) * m:(chunks_t + c + 1) * m])

    bound = chunks_d * y * 127 * 127
    for dlists, (ol_ref, oh_ref) in zip(
            (d00, d01, d10, d11),
            ((e00l_ref, e00h_ref), (e01l_ref, e01h_ref),
             (e10l_ref, e10h_ref), (e11l_ref, e11h_ref))):
        diags = [d[0] if wb == 1 else jnp.concatenate(d, axis=0)
                 for d in dlists]
        rh, rl = _fold_redc28(diags, qh, ql, qi28, diag_bound=bound,
                              bits=bits)
        ol_ref[0] = rl.reshape(wb, m, m)
        oh_ref[0] = rh.reshape(wb, m, m)


class SlicedGemm2x2:
    """E_ij = scale * U_i^T @ V_j (i, j in {1, 2}; real, modular,
    contraction over the SECOND-TO-LAST axis of both) for [L, W, y, m] u64
    operands over one equal-chunk-count limb run — the gl2 ciphertext
    GEMM's four tensor components in one fused Mosaic kernel (the
    XLA-composed u64 chunk einsum it replaces runs the multiply on
    emulated-u64 VPU lanes, far off the int8 MXU roof).

    Multi-chip note: like every pallas_call, this custom call is not
    auto-partitionable under NamedSharding jit — shard the (L, W) grid
    axes via shard_map, or use the XLA oracle path (MFHE_GEMM2=xla) for
    sharded graphs (the virtual-mesh dryrun does the latter
    automatically: the kernel gate is off on the CPU backend)."""

    def __init__(self, moduli, y: int, m: int, scale: int = 1, wb: int = 4):
        self.moduli = tuple(int(q) for q in moduli)
        self.y, self.m = y, m
        self.bits = max(q.bit_length() for q in self.moduli)
        assert self.bits < 48
        self.chunks_d = -(-self.bits // CHUNK_BITS)
        self.chunks_t = self.chunks_d
        self.wb = wb
        L = len(self.moduli)
        cj = np.zeros((L, 1, 2 * self.chunks_d), dtype=np.uint32)
        for l, q in enumerate(self.moduli):
            for j in range(self.chunks_d):
                c = (scale % q) * pow(2, 28 + CHUNK_BITS * j + 64, q) % q
                cj[l, 0, 2 * j] = c & 0xFFFFFFFF
                cj[l, 0, 2 * j + 1] = c >> 32
        self._cj = jnp.asarray(cj)
        sc = np.empty((L, 1, 5), dtype=np.uint32)
        for l, q in enumerate(self.moduli):
            mc = MontConsts.make(q)
            sc[l] = (q & 0xFFFFFFFF, q >> 32,
                     mc.qinv_neg & 0xFFFFFFFF, mc.qinv_neg & 0x0FFFFFFF,
                     mc.qinv_neg >> 32)
        self._sc = jnp.asarray(sc)

    @functools.lru_cache(maxsize=4)
    def _call(self, W: int, wb: int):
        L, y, m = len(self.moduli), self.y, self.m
        kern = functools.partial(
            _gemm2x2_kernel, wb=wb, y=y, m=m, chunks_d=self.chunks_d,
            chunks_t=self.chunks_t, bits=self.bits)
        in_spec = pl.BlockSpec((1, wb, y, m), lambda l, w: (l, w, 0, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, wb, m, m), lambda l, w: (l, w, 0, 0),
                                memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, 1, 5), lambda l, w: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        cj_spec = pl.BlockSpec((1, 1, 2 * self.chunks_d),
                               lambda l, w: (l, 0, 0),
                               memory_space=pltpu.SMEM)
        sh = jax.ShapeDtypeStruct((L, W, m, m), jnp.uint32)
        return pl.pallas_call(
            kern,
            grid=(L, W // wb),
            in_specs=[in_spec] * 8 + [sc_spec, cj_spec],
            out_specs=(out_spec,) * 8,
            out_shape=(sh,) * 8,
            interpret=_backend.pallas_interpret_default(),
            compiler_params=_sliced_params(2),
        )

    def __call__(self, u1, u2, v1, v2):
        """u64 [L, W, y, m] operands -> (e00, e01, e10, e11) u64
        [L, W, m, m] with e_ij = scale * U_i^T @ V_j mod q."""
        W = u1.shape[1]
        wb = self.wb
        while W % wb:
            wb //= 2
        pairs = [split_u64(t) for t in (u1, u2, v1, v2)]
        flat = [p for pair in pairs for p in pair]
        call = self._call(W, wb)
        with jax.enable_x64(False):
            outs = call(*flat, self._sc, self._cj)
        return tuple(join_u64(outs[2 * i], outs[2 * i + 1])
                     for i in range(4))
