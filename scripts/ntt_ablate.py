#!/usr/bin/env python
"""Per-component ablation of the sliced NTT kernel on the real chip.

Runs the bench shape (N=2^16, L=16, B=128, true 35-bit primes) with
MFHE_SLICED_ABLATE set to each truncation point in turn and prints the
marginal cost of every component (us/NTT).  The ablated kernels return
garbage, so unlike bench.py there is no bit-exact fence here — the full
kernel's exactness is asserted separately at the end.  Timing chains
calls and fences with one device_get (tunnel methodology, docs/PERF.md).

Usage: python scripts/ntt_ablate.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "xla"))

STAGES = ["io", "extract", "dots", "stage1", "tw", ""]  # "" = full kernel
LABEL = {"io": "io (copy through the grid)",
         "extract": "+ stage-A digit extract",
         "dots": "+ stage-A MXU dots",
         "stage1": "+ stage-A fold (REDC28)",
         "tw": "+ lazy twiddle",
         "": "+ stage-B (extract+dots+fold) = full"}


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    # Pin every sliced-kernel knob before any SlicedFourStepNTT exists:
    # ambient MFHE_SLICED_DMA would silently swap in _sliced_dma_kernel
    # (which ignores MFHE_SLICED_ABLATE, so all rows would time the full
    # kernel), and ambient CTW/KARA_B aborts on the ABLATE ValueError.
    for knob in ("MFHE_SLICED_DMA", "MFHE_SLICED_CTW", "MFHE_SLICED_KARA_B",
                 "MFHE_SLICED_ILV", "MFHE_SLICED_ALIAS",
                 "MFHE_SLICED_SEMANTICS"):
        os.environ.pop(knob, None)
    os.environ["MFHE_SLICED_BB"] = os.environ.get("NTT_ABLATE_BB", "1")
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

    prev = None
    rows = []
    for ab in STAGES:
        if ab:
            os.environ["MFHE_SLICED_ABLATE"] = ab
        else:
            os.environ.pop("MFHE_SLICED_ABLATE", None)
        ntt = pn.SlicedFourStepNTT(plan)
        fwd = jax.jit(ntt.forward_pair4)
        a, b = fwd(lo, hi)
        _ = jax.device_get(a.ravel()[:1])
        t0 = time.perf_counter()
        a, b = lo, hi
        for _ in range(iters):
            a, b = fwd(a, b)
        _ = jax.device_get(a.ravel()[:1])
        us = (time.perf_counter() - t0) / iters / (L * B) * 1e6
        delta = us - prev if prev is not None else us
        prev = us
        rows.append((LABEL[ab], us, delta))
        print(f"{LABEL[ab]:42s} {us:7.2f} us/NTT  (+{delta:5.2f})",
              flush=True)
        # each ablation retraces/rejits a fresh kernel; drop the jit cache
        # AND the class-level lru_cache, which otherwise keeps every
        # instance's sliced twiddle tables resident in HBM for the run
        fwd.clear_cache()
        pn.SlicedFourStepNTT._fused_call.cache_clear()
        del ntt

    # exactness fence on the FULL kernel only
    ntt = pn.SlicedFourStepNTT(plan)
    back = np.asarray(pn.join_u64(
        *jax.jit(ntt.inverse_pair4)(*jax.jit(ntt.forward_pair4)(lo, hi))))
    assert (back.reshape(x.shape) == x).all(), "full-kernel roundtrip broken"
    total = rows[-1][1]
    print(f"full kernel exact; total {total:.2f} us/NTT = "
          f"{1e6 / total * 1:,.0f} NTT/s at L*B amortization")


if __name__ == "__main__":
    main()
