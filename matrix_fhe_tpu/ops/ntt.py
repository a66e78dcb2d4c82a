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
RING_GL2 = "gl2"          # the GL ring's integral double form X^{2n} + 1
#   (Z[i][X]/(X^n - i) ~= Z[X]/(X^{2n}+1) via i = X^n; tables.py
#   build_gl2_x_tables) — same algebra as "gl" but with one global integer
#   coefficient ring, so key switching / FBC apply (keyswitch.py:70-77).


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
        elif ring == RING_GL2:
            from ..tables import build_gl2_x_tables
            fwd, inv = build_gl2_x_tables(t)
        else:
            raise ValueError(f"unknown ring {ring!r}")
        self._fwd = BatchedModTransform(fwd, params.moduli, side="right")
        self._inv = BatchedModTransform(inv, params.moduli, side="right")
        from ._backend import tpu_kernels_default
        self._use_pallas = (tpu_kernels_default()
                            if use_pallas is None else use_pallas)
        self._fwd_p = self._inv_p = None
        if self._use_pallas:
            import numpy as np

            from .modmatmul import limb_runs
            from .pallas_ntt import make_stage_hybrid as make_stage
            self._runs = limb_runs(params.moduli)
            # n < 128 wastes half of every (8,128) vreg in the fold and half
            # the MXU contraction lanes; pack `pack` adjacent polynomials
            # side by side (a free reshape) against block-diagonal tables
            n = int(fwd.shape[-1])  # transform dim (2n for ring="gl2")
            self._pack = max(1, 128 // n)
            if self._pack > 1:
                eye = np.eye(self._pack, dtype=np.uint64)
                fwd = np.stack([np.kron(eye, fwd[l]) for l in range(len(fwd))])
                inv = np.stack([np.kron(eye, inv[l]) for l in range(len(inv))])
            self._fwd_p = [make_stage(fwd[lo:hi], params.moduli[lo:hi],
                                      side="right")
                           for lo, hi, _ in self._runs]
            self._inv_p = [make_stage(inv[lo:hi], params.moduli[lo:hi],
                                      side="right")
                           for lo, hi, _ in self._runs]
            self._mul_s_p = None
            wide = max(int(q).bit_length() for q in params.moduli) >= 48
            if n % self._pack == 0 and not wide:
                from .pallas_ntt import make_ntt_mul_ntt
                rep = n // self._pack
                self._mul_s_p = [
                    make_ntt_mul_ntt(fwd[lo:hi], inv[lo:hi],
                                     params.moduli[lo:hi], rep=rep)
                    for lo, hi, _ in self._runs]

    def _apply(self, trans, stages, x: jnp.ndarray) -> jnp.ndarray:
        L = x.shape[0]
        n = x.shape[-1]
        flat = x.reshape(L, -1, n)
        rows = flat.shape[1]
        if (stages is not None and rows % (8 * self._pack) == 0):
            from .pallas_ntt import join_u64, split_u64
            if self._pack > 1:
                flat = flat.reshape(L, rows // self._pack, n * self._pack)
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

    def mul_s(self, a: jnp.ndarray, s_mont: jnp.ndarray) -> jnp.ndarray:
        """t = iNTT_X(NTT_X(a) * s), the encrypt/decrypt hot path
        (pointwise_mul_s_kernel + xy NTT round trip, HE.cu:509-531,
        1509-1526).  a: [L, W, n, n] u64 X-coeff; s_mont: [L, W, n] u64,
        X-NTT domain, Montgomery form.  On TPU this is ONE fused Pallas
        kernel per limb run (the NTT spectrum never leaves VMEM)."""
        import numpy as np

        from ..ops import modmath as mm

        n = a.shape[-1]
        L, W = a.shape[0], a.shape[1]
        pack = getattr(self, "_pack", 1)
        fused = (getattr(self, "_mul_s_p", None) is not None
                 and a.ndim == 4 and a.shape[2] == n and n % pack == 0)
        if not fused:
            q = jnp.asarray(np.asarray(self.params.moduli, np.uint64)
                            ).reshape((L,) + (1,) * (a.ndim - 1))
            qinv = jnp.asarray(np.array(
                [mm.MontConsts.make(int(m)).qinv_neg
                 for m in self.params.moduli], np.uint64)
                ).reshape((L,) + (1,) * (a.ndim - 1))
            s_b = s_mont.reshape(s_mont.shape[:2] + (1,) * (a.ndim - 3)
                                 + (n,))
            t_ntt = mm.mont_mul(self.forward(a), s_b, q, qinv)
            return self.inverse(t_ntt)
        from .pallas_ntt import join_u64, split_u64
        al, ah = split_u64(a)
        sl, sh = split_u64(s_mont)
        ol, oh = self.mul_s_pair(al, ah, sl, sh)
        return join_u64(ol, oh)

    def mul_s_pair(self, al, ah, sl, sh):
        """mul_s on u32 lo/hi planes: a [L, W, n, n], s [L, W, n]."""
        n = al.shape[-1]
        L, W = al.shape[0], al.shape[1]
        pack = getattr(self, "_pack", 1)
        kp = n * pack
        fl = al.reshape(L, W * n // pack, kp)
        fh = ah.reshape(L, W * n // pack, kp)
        s2l = jnp.tile(sl, (1, 1, pack))                 # [L, W, kp]
        s2h = jnp.tile(sh, (1, 1, pack))
        outs_l, outs_h = [], []
        for (lo, hi, _), st in zip(self._runs, self._mul_s_p):
            olo, ohi = st(fl[lo:hi], fh[lo:hi], s2l[lo:hi], s2h[lo:hi])
            outs_l.append(olo)
            outs_h.append(ohi)
        ol = jnp.concatenate(outs_l) if len(outs_l) > 1 else outs_l[0]
        oh = jnp.concatenate(outs_h) if len(outs_h) > 1 else outs_h[0]
        return ol.reshape(al.shape), oh.reshape(al.shape)

    def wrap_constant(self, limb: int) -> int:
        """The X^n wraparound constant of this ring mod q_limb: q-1 for
        negacyclic, psi4n^n for GL (test_custom_ntt_roundtrip.cu:260-261)."""
        q = int(self.params.moduli[limb])
        if self.ring in (RING_NEGACYCLIC, RING_GL2):
            return q - 1  # gl2: X^{2n} = -1 (double-degree negacyclic)
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
