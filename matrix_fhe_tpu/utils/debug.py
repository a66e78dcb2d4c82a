"""Debug / sanity hooks mirroring the reference's device checks.

* check_moduli: the moduli-readback check (copy_device_moduli, HE.cu:410-422
  and test_custom_ntt_roundtrip.cu:52-58) — verifies the device-resident
  per-limb constants of a context's transforms agree with the host
  parameter set bit-for-bit.
* count_nonzero / count_over_i64: the orphaned sanity kernels
  count_nonzero_i64_kernel / count_big_over_i64_kernel (HE.cu:1204-1222) as
  batched jnp reductions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def check_moduli(ctx) -> bool:
    """Round-trip the device copies of the moduli back to host and compare
    (the reference prints and aborts; here: return False on mismatch)."""
    want = np.asarray(ctx.params.moduli, dtype=np.uint64)
    got = np.asarray(ctx._c3["q"]).reshape(-1)
    if not np.array_equal(want, got):
        return False
    # Montgomery constants must be consistent with q
    from ..ops.modmath import MontConsts
    qinv = np.asarray(ctx._c3["qinv_neg"]).reshape(-1)
    for q, qi in zip(want, qinv):
        if MontConsts.make(int(q)).qinv_neg != int(qi):
            return False
    return True


def count_nonzero(x: jnp.ndarray) -> int:
    """count_nonzero_i64_kernel (HE.cu:1204-1211)."""
    return int(jnp.sum((x != 0).astype(jnp.int64)))


def count_over_i64(mag_hi_words: jnp.ndarray) -> int:
    """count_big_over_i64_kernel (HE.cu:1213-1222): how many big-int
    magnitudes exceed int64 (any high word nonzero)."""
    return int(jnp.sum(jnp.any(mag_hi_words != 0, axis=-1)
                       .astype(jnp.int64)))


def composed_magnitude(ctx, x_eval: jnp.ndarray) -> int:
    """Max |centered CRT-composed integer| of a mod-Q element given in the
    stored (W-eval, X-coeff) layout — THE way to measure key-switch /
    rescale noise: a small ring element has FULL-RANGE W-eval lane values,
    so per-lane diffs of a small element look like uniform residues
    (round-2 finding; see docs/ARCHITECTURE.md).  Exact host bigints."""
    dw = np.asarray(ctx.wt.inverse(x_eval)).astype(object)
    moduli = [int(q) for q in ctx.params.moduli]
    big_q = 1
    for q in moduli:
        big_q *= q
    val = np.zeros(dw.shape[1:], dtype=object)
    for l, q in enumerate(moduli):
        m = big_q // q
        val = (val + dw[l] * (pow(m, -1, q) * m % big_q)) % big_q
    val = np.where(val > big_q // 2, val - big_q, val)
    return int(max(abs(int(v)) for v in val.ravel()))


def noise_magnitude(ctx, ct, sk, expected_eval: jnp.ndarray) -> int:
    """Debug-only (requires the secret key): max |composed noise integer|
    of `ct` against the expected plaintext (stored layout)."""
    from ..ops import modmath as mm
    got = ctx.decrypt_to_eval(ct, sk)
    diff = mm.sub_mod(got, jnp.asarray(expected_eval), ctx._c4["q"])
    return composed_magnitude(ctx, diff)
