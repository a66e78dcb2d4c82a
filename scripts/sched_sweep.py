#!/usr/bin/env python
"""Kernel-schedule sweep for the sliced NTT, one process, on-chip.

Builds the bench-shape plan and input ONCE (the per-invocation plan build
+ 1 GB tunnel upload dominates a bench.py row), then times each schedule
row with the chained-call + single-readback methodology.  Every row pins
ALL MFHE_SLICED_* knobs (ADVICE r4: ambient env must not swap or abort
the kernel a row claims to measure), and every row is checksummed against
the base row on-device (schedule variants must be bit-identical).

This is also the kernel-shaped co-issue probe VERDICT r4 Next #5 asks
for: the ILV rows issue tile j's stage-A MXU dots before tile j-1's VPU
tail at the REAL tile shape, so (ILV on - ILV off) at fixed bb IS the
measured co-issue benefit, replacing the cell-shaped micro_coissue
methodology that mispredicted karaB by 2.8x.

Usage: python scripts/sched_sweep.py [iters] [rows...]
  rows default: bb1 bb2 bb4 bb8 ilv2 ilv4 par1 par4
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "xla"))

KNOBS = ("MFHE_SLICED_DMA", "MFHE_SLICED_CTW", "MFHE_SLICED_KARA_B",
         "MFHE_SLICED_ILV", "MFHE_SLICED_ALIAS", "MFHE_SLICED_SEMANTICS",
         "MFHE_SLICED_ABLATE", "MFHE_SLICED_BB")

ROWS = {
    "bb1":  {"MFHE_SLICED_BB": "1"},
    "bb2":  {"MFHE_SLICED_BB": "2"},
    "bb4":  {"MFHE_SLICED_BB": "4"},
    "bb8":  {"MFHE_SLICED_BB": "8"},
    "ilv2": {"MFHE_SLICED_BB": "2", "MFHE_SLICED_ILV": "1"},
    "ilv4": {"MFHE_SLICED_BB": "4", "MFHE_SLICED_ILV": "1"},
    "ilv8": {"MFHE_SLICED_BB": "8", "MFHE_SLICED_ILV": "1"},
    "par1": {"MFHE_SLICED_BB": "1", "MFHE_SLICED_SEMANTICS": "parallel"},
    "par4": {"MFHE_SLICED_BB": "4", "MFHE_SLICED_SEMANTICS": "parallel"},
    "dma":  {"MFHE_SLICED_BB": "1", "MFHE_SLICED_DMA": "1"},
}
DEFAULT = ["bb1", "bb2", "bb4", "bb8", "ilv2", "ilv4", "par1", "par4"]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    names = sys.argv[2:] or DEFAULT
    for k in KNOBS:
        os.environ.pop(k, None)
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from matrix_fhe_tpu.ops.ntt_large import FourStepPlan, generate_primes_1mod
    from matrix_fhe_tpu.ops import pallas_ntt as pn

    N, L, B = 1 << 16, 16, 128
    primes = generate_primes_1mod(L, 35, 2 * N)
    plan = FourStepPlan.make(N, primes)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, size=(B, N), dtype=np.uint64)
                  for q in primes])
    lo, hi = pn.split_u64(jnp.asarray(x))
    lo = jnp.asarray(np.asarray(lo).reshape(L, B, plan.n1, plan.n2))
    hi = jnp.asarray(np.asarray(hi).reshape(L, B, plan.n1, plan.n2))

    csum = jax.jit(lambda a, b: (jnp.sum(a.astype(jnp.uint64)),
                                 jnp.sum(b.astype(jnp.uint64))))
    ref_sum = None
    for name in names:
        env = ROWS[name]
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            ntt = pn.SlicedFourStepNTT(plan)
            fwd = jax.jit(ntt.forward_pair4)
            a, b = fwd(lo, hi)
            s = jax.device_get(csum(a, b))
            if ref_sum is None:
                ref_sum = s
            ok = (s[0] == ref_sum[0]) and (s[1] == ref_sum[1])
            t0 = time.perf_counter()
            a, b = lo, hi
            for _ in range(iters):
                a, b = fwd(a, b)
            _ = jax.device_get(a.ravel()[:1])
            us = (time.perf_counter() - t0) / iters / (L * B) * 1e6
            print(f"{name:6s} {us:7.2f} us/NTT  {1e6/us:10,.0f} NTT/s  "
                  f"checksum {'OK' if ok else 'MISMATCH'}", flush=True)
            fwd.clear_cache()
        except Exception as e:
            print(f"{name:6s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        finally:
            pn.SlicedFourStepNTT._fused_call.cache_clear()


if __name__ == "__main__":
    main()
