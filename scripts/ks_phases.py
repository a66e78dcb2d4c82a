"""Key-switch phase table at reference geometry (run on the real chip).

VERDICT round-2 weak #3: multiply_relinearize at "mid" measured 117.6 ms
steady with NO phase breakdown.  The streamed jit decomposition
(RelinContext._mr_front_jit / _digit_step_jit / _mr_finish_jit) gives the
natural cut points:

  front:   4 X-NTTs + tensor products + W-CRT inverse of d2
  digit i: FBC extend -> W-CRT fwd + X-NTT over QP -> 2 rlk products
  finish:  QP inverse transforms + ModDown(P->Q) + W-CRT fwd + adds

Usage: python scripts/ks_phases.py [preset] [iters]
Prints per-phase ms plus the fused multiply_relinearize steady state.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from matrix_fhe_tpu.config import get_params  # noqa: E402
from matrix_fhe_tpu.models import rng as refrng  # noqa: E402
from matrix_fhe_tpu.models.he import HEContext  # noqa: E402
from matrix_fhe_tpu.models.keyswitch import RelinContext  # noqa: E402


def fence(x):
    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    _ = np.asarray(leaf.ravel()[:1])


def bench(fn, args, iters, donated=()):
    # donated buffers are re-copied before EVERY call (incl. warmup) so the
    # originals survive; the copies happen outside the timed region
    def fresh():
        call_args = list(args)
        for d in donated:
            call_args[d] = jax.tree.map(jnp.copy, call_args[d])
        jax.block_until_ready(call_args)
        return call_args

    out = fn(*fresh())
    fence(out)
    t = 0.0
    for _ in range(iters):
        call_args = fresh()
        t0 = time.perf_counter()
        out = fn(*call_args)
        jax.block_until_ready(out)
        t += time.perf_counter() - t0
    fence(out)
    return t / iters * 1e3


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "mid"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    p = get_params(preset)
    ctx = HEContext(p, ring="nega")
    rc = RelinContext(ctx, p_moduli="auto"
                      if os.environ.get("MFHE_AUTO_P") == "1" else None)
    print(f"[ks] P basis: {[int(q).bit_length() for q in rc.p_moduli]} dnum={rc.dnum}")
    sk = ctx.generate_secret_key()
    rng = np.random.default_rng(0)
    rlk = rc.gen_relin_key(jnp.asarray(refrng.ternary_secret(p)),
                           jax.random.key(5))
    c = rng.integers(0, 1 << 20, size=(p.phi, p.n, p.n))
    coeffs = jnp.asarray(np.stack([(c % int(q)).astype(np.uint64)
                                   for q in p.moduli]))
    ct = ctx.encrypt(ctx.wt.forward(coeffs), sk)

    # fused steady state
    out = rc.multiply_relinearize(ct, ct, rlk)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = rc.multiply_relinearize(ct, ct, rlk)
    fence(out)
    fused = (time.perf_counter() - t0) / iters * 1e3
    print(f"fused multiply_relinearize: {fused:8.2f} ms")

    # phases
    front = rc._mr_front_jit
    d0c, d1c, d2wc = front(ct, ct)
    fence((d0c, d1c, d2wc))
    t = bench(front, (ct, ct), iters)
    print(f"front (4 XNTT + tensor + wt.inv):   {t:8.2f} ms")

    frame = (len(rc.qp_moduli), p.phi, rc.y_dim, rc.x_dim)
    ksb = jnp.zeros(frame, jnp.uint64)
    ksa = jnp.zeros(frame, jnp.uint64)
    total_digits = 0.0
    for i, g in enumerate(rc.groups):
        step = rc._digit_step_jit(i)
        grp = d2wc[jnp.asarray(list(g))]
        t = bench(step, (grp, rlk.b[i], rlk.a[i], ksb, ksa), iters,
                  donated=(3, 4))
        total_digits += t
        print(f"digit {i} (extend+QP fwd+products): {t:8.2f} ms")
        ksb, ksa = step(grp, rlk.b[i], rlk.a[i],
                        jax.tree.map(jnp.copy, ksb),
                        jax.tree.map(jnp.copy, ksa))

    finish = rc._mr_finish_jit
    t = bench(finish, (d0c, d1c, ksb, ksa), iters)
    print(f"finish (QP inv + ModDown + wt.fwd): {t:8.2f} ms")
    print(f"digits total: {total_digits:.2f} ms over {rc.dnum} digits")


if __name__ == "__main__":
    main()
