"""X-axis NTT (degree-n polynomial axis) as exact MXU matmuls.

The reference drives this axis two ways (selected by kDbgUsePhantomXY,
HE.cu:25,1224-1242):
  * production: phantom-fhe's fnwt_1d/inwt_1d negacyclic (X^n+1) NTT, host-
    looped over 32,768 polys (ntt_core.cu:443-460) — the known launch-bound
    hot spot;
  * GL path: beta = psi_4n twist (beta^n = +-i) + 6 stage-per-launch cyclic
    butterflies (ntt_core.cu:394-481), realizing the X^n = i ring.

Here a full-ciphertext X transform is ONE batched [*, n] @ [n, n]^T chunked
int8 matmul per limb group — no host loops, no launch storm.  Because the
stored ciphertext never contains NTT-internal ordering (encrypt does
fwd -> pointwise -> inv before storing, HE.cu:1505-1530), exact integer
convolution semantics — which these matmuls provide — is all that bit-exact
parity requires.

Also provides the GL 5^j-orbit permutation (apply_gl_perm,
ntt_core.cu:150-173,258-269) and negacyclic_polymul convenience.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import GLParams
from ..tables import GLTables, build_tables
from .modmatmul import BatchedModTransform

RING_NEGACYCLIC = "nega"  # X^n + 1 (production / phantom parity ring)
RING_GL = "gl"            # X^n = psi4n^n (= +-i) GL twist ring


class XNTT:
    """Forward/inverse length-n transform along the trailing axis of
    [L, ..., n] uint64 arrays, batched over everything else."""

    def __init__(self, params: GLParams, ring: str = RING_NEGACYCLIC,
                 tables: GLTables | None = None,
                 use_pallas: bool | None = None):
        import jax

        t = tables or build_tables(params)
        self.params = params
        self.ring = ring
        if ring == RING_NEGACYCLIC:
            fwd, inv = t.x_fwd_nega, t.x_inv_nega
        elif ring == RING_GL:
            fwd, inv = t.x_fwd_gl, t.x_inv_gl
        else:
            raise ValueError(f"unknown ring {ring!r}")
        self._fwd = BatchedModTransform(fwd, params.moduli, side="right")
        self._inv = BatchedModTransform(inv, params.moduli, side="right")
        self._use_pallas = (jax.default_backend() == "tpu"
                            if use_pallas is None else use_pallas)
        self._fwd_p = self._inv_p = None
        if self._use_pallas:
            from .modmatmul import limb_runs
            from .pallas_ntt import PallasStage
            self._runs = limb_runs(params.moduli)
            self._fwd_p = [PallasStage(fwd[lo:hi], params.moduli[lo:hi],
                                       side="right")
                           for lo, hi, _ in self._runs]
            self._inv_p = [PallasStage(inv[lo:hi], params.moduli[lo:hi],
                                       side="right")
                           for lo, hi, _ in self._runs]

    def _apply(self, trans, stages, x: jnp.ndarray) -> jnp.ndarray:
        L = x.shape[0]
        n = x.shape[-1]
        flat = x.reshape(L, -1, n)
        if stages is not None and flat.shape[1] % 8 == 0:
            from .pallas_ntt import join_u64, split_u64
            outs = []
            for (lo, hi, _), st in zip(self._runs, stages):
                dlo, dhi = split_u64(flat[lo:hi])
                olo, ohi = st(dlo, dhi)
                outs.append(join_u64(olo, ohi))
            out = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
            return out.reshape(x.shape)
        return trans(flat).reshape(x.shape)

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self._fwd, self._fwd_p, x)

    def inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self._inv, self._inv_p, x)

    def wrap_constant(self, limb: int) -> int:
        """The X^n wraparound constant of this ring mod q_limb: q-1 for
        negacyclic, psi4n^n for GL (test_custom_ntt_roundtrip.cu:260-261)."""
        q = int(self.params.moduli[limb])
        if self.ring == RING_NEGACYCLIC:
            return q - 1
        t = build_tables(self.params)
        return pow(t.psi4n[limb], self.params.n, q)


def apply_gl_perm(x: jnp.ndarray, perm) -> jnp.ndarray:
    """Permute the trailing axis: out[..., perm[j]] = x[..., j].

    Mirrors gl_perm_kernel (ntt_core.cu:258-269); pass tables.gl_perm for the
    forward 5^j-orbit -> bit-reversed mapping and tables.gl_inv_perm to undo
    it (apply_gl_perm wrapper, ntt_core.cu:433-441).
    """
    import numpy as np

    p = np.asarray(perm)
    gather = np.empty_like(p)
    gather[p] = np.arange(p.size)  # out[..., i] = x[..., gather[i]]
    return jnp.take(x, jnp.asarray(gather), axis=-1)
