"""Exact modular matrix multiplication on the MXU.

The reference's hottest loops are dense modular matvecs executed one output
element per CUDA thread with an O(K) `__int128 %` loop:
  * the 512-point W-CRT transform (HE.cu:716-781, wntt_forward/inverse_matrix),
  * the X-axis NTT when written as a matrix (ntt_core.cu:271-338),
  * the homomorphic trace GEMM (trace.cu:77-131, batched_trace.cu:99-158).

On TPU these are *matmuls* and belong on the systolic array.  The MXU has no
modular unit, so we make the integer product exact by 7-bit chunk
decomposition:

    a = sum_i a_i 2^(7i),  b = sum_j b_j 2^(7j),   a_i, b_j in [0,127]

    (A @ B)[w,m] = sum_{i,j} 2^(7(i+j)) * sum_r A_i[w,r] B_j[r,m]

Each inner sum is an int8 x int8 -> int32 dot_general: products are < 2^14
and K <= 2^15 rows keeps the i32 accumulator exact (2^14 * 2^15 < 2^31 with
headroom).  Partial results are grouped by diagonal s = i+j (still exact in
int32 for K <= 2^12; for larger K the per-diagonal sums are widened first)
and folded back mod q with one Montgomery multiply per diagonal against the
precomputed constant 2^(7s) * R mod q.

This gives bit-exact residues while running ~all FLOPs on the MXU in int8.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .modmath import U64, mont_mul, MontConsts

CHUNK_BITS = 7
_CHUNK_MASK = np.uint64((1 << CHUNK_BITS) - 1)


def num_chunks(bits: int, chunk_bits: int = CHUNK_BITS) -> int:
    return -(-bits // chunk_bits)


def chunk_decompose(x: jnp.ndarray, chunks: int, chunk_bits: int = CHUNK_BITS
                    ) -> jnp.ndarray:
    """Split uint64 array into `chunks` int8 planes; output [chunks, *x.shape]."""
    planes = [((x >> np.uint64(chunk_bits * i)) & np.uint64((1 << chunk_bits) - 1)
               ).astype(jnp.int8) for i in range(chunks)]
    return jnp.stack(planes, axis=0)


def pow2r_table(moduli: Sequence[int], total_chunks: int,
                chunk_bits: int = CHUNK_BITS, shape_suffix=(1, 1)) -> jnp.ndarray:
    """[S, L, 1, 1] uint64 table of 2^(chunk_bits*s) * R mod q_l (Montgomery
    form of the chunk radix powers)."""
    rows = []
    for s in range(total_chunks):
        row = []
        for q in moduli:
            r_mod = (1 << 64) % q
            row.append((1 << (chunk_bits * s)) * r_mod % q)
        rows.append(row)
    arr = np.array(rows, dtype=np.uint64)
    return jnp.asarray(arr.reshape((total_chunks, len(moduli)) + tuple(shape_suffix)))


def _dot_i8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched int8 matmul with exact int32 accumulation: [B,W,R]@[B,R,M]."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def modmatmul_chunked(table_chunks: jnp.ndarray,
                      data_chunks: jnp.ndarray,
                      q: jnp.ndarray,
                      qinv_neg: jnp.ndarray,
                      pow2r: jnp.ndarray,
                      widen: bool = False) -> jnp.ndarray:
    """Exact (table @ data) mod q from pre-chunked int8 operands.

    table_chunks: [ct, B, W, R] int8    (B = modulus batch, e.g. RNS limbs)
    data_chunks:  [cd, B, R, M] int8
    q, qinv_neg:  [B, 1, 1] uint64
    pow2r:        [ct+cd-1, B, 1, 1] uint64 — 2^(7s)*R mod q
    widen:        accumulate diagonals in uint64 instead of int32 (needed
                  when R * 127^2 * min(ct,cd) could exceed 2^31).
    Returns [B, W, M] uint64, fully reduced mod q.
    """
    ct = table_chunks.shape[0]
    cd = data_chunks.shape[0]
    n_diag = ct + cd - 1
    diags = [None] * n_diag
    for i in range(ct):
        for j in range(cd):
            p = _dot_i8(table_chunks[i], data_chunks[j])
            if widen:
                p = p.astype(U64)
            s = i + j
            diags[s] = p if diags[s] is None else diags[s] + p

    out = None
    for s in range(n_diag):
        d = diags[s].astype(U64) if not widen else diags[s]
        term = mont_mul(d, pow2r[s], q, qinv_neg)
        out = term if out is None else jnp.where(out + term >= q,
                                                 out + term - q, out + term)
    return out


def modmatmul(table: jnp.ndarray, data: jnp.ndarray,
              moduli: Sequence[int],
              table_bits: int, data_bits: int,
              chunk_bits: int = CHUNK_BITS) -> jnp.ndarray:
    """Convenience wrapper chunking both operands on the fly.

    table: [B, W, R] uint64, data: [B, R, M] uint64 with B == len(moduli).
    """
    ct = num_chunks(table_bits, chunk_bits)
    cd = num_chunks(data_bits, chunk_bits)
    B = len(moduli)
    consts = _matmul_consts(tuple(int(m) for m in moduli), ct + cd - 1, chunk_bits)
    k = table.shape[-1]
    widen = k * (127 ** 2) * min(ct, cd) >= (1 << 31)
    return modmatmul_chunked(
        chunk_decompose(table, ct, chunk_bits),
        chunk_decompose(data, cd, chunk_bits),
        consts["q"], consts["qinv_neg"], consts["pow2r"], widen=widen)


def _matmul_consts(moduli: tuple, total_chunks: int, chunk_bits: int):
    qs = np.array(moduli, dtype=np.uint64).reshape(len(moduli), 1, 1)
    qinv = np.array([MontConsts.make(int(q)).qinv_neg for q in moduli],
                    dtype=np.uint64).reshape(len(moduli), 1, 1)
    return {
        "q": jnp.asarray(qs),
        "qinv_neg": jnp.asarray(qinv),
        "pow2r": pow2r_table(moduli, total_chunks, chunk_bits),
    }
