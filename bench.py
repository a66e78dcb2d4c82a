#!/usr/bin/env python
"""Headline benchmark: NTTs/sec/chip at N=2^16 (RNS L=16).

Driver contract: print ONE JSON line
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the BASELINE.json target of 1,000,000
single-modulus N=2^16 NTTs per second per chip.

Each forward call transforms L*B independent (modulus, polynomial) pairs;
every pair is one N=2^16 negacyclic NTT (the per-limb accounting used by
GPU-FHE literature).  Residues are stored as u32 lo/hi planes (TPU has no
64-bit vector unit; the pair layout is this framework's native ciphertext
word format).

Timing methodology: through the remote-TPU tunnel, jax.block_until_ready
can return before work completes (see .claude/skills/verify/SKILL.md), so
the timed loop CHAINS the NTT (output feeds the next input — valid since
outputs are canonical residues) and fences with a device->host readback.
Uses a persistent compilation cache so repeated driver runs skip the
one-time XLA compile.
"""

import json
import os
import sys
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".cache", "xla")


def main():
    os.makedirs(CACHE_DIR, exist_ok=True)

    # Failure visibility: if the axon tunnel is unreachable the first jax
    # call hangs forever, and a driver timeout would record nothing.  One
    # SIGTERM handler covers every phase (error line before the first
    # measurement, partial results after), and a watchdog timer covers the
    # pure-hang case; the timer disarms at the FIRST device readback (so a
    # slow-but-healthy cold compile is never misreported).
    # BENCH_DEVICE_TIMEOUT_S=0 disables the timer (not the handler).
    import signal
    import threading
    wd_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "900"))
    fence_done = threading.Event()   # first device->host readback returned
    results = {}                     # filled once the headline is measured

    METRIC = "NTTs/sec/chip (N=2^16, L=16, negacyclic, 35-bit primes)"

    def _emit_and_exit(reason: str):
        if results:
            out = {"metric": METRIC, "partial": True, **results}
            code = 0
        else:
            out = {"metric": METRIC, "value": 0.0, "unit": "NTT/s",
                   "vs_baseline": 0.0, "error": reason}
            code = 2
        print(json.dumps(out))
        sys.stdout.flush()
        os._exit(code)

    def _on_term(signum, frame):  # pragma: no cover - signal path
        _emit_and_exit("terminated before the first NTT measurement "
                       "(tunnel unreachable, or cold compile exceeded the "
                       "driver timeout)")

    signal.signal(signal.SIGTERM, _on_term)

    def _watchdog():
        if not fence_done.is_set():
            _emit_and_exit(f"no device response within {wd_s:.0f}s (axon "
                           "tunnel down, or a cold compile exceeded the "
                           "watchdog — raise BENCH_DEVICE_TIMEOUT_S)")

    wd_timer = None
    if wd_s > 0:
        wd_timer = threading.Timer(wd_s, _watchdog)
        wd_timer.daemon = True
        wd_timer.start()

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from matrix_fhe_tpu.ops.ntt_large import (FourStepNTT, FourStepPlan,
                                              generate_primes_1mod)
    from matrix_fhe_tpu.ops.pallas_ntt import (PallasFourStepNTT,
                                               SlicedFourStepNTT, join_u64,
                                               split_u64)

    N = 1 << 16
    L = 16
    B = int(os.environ.get("BENCH_BATCH", "128"))
    # ~30 ms fixed device_get fence amortizes over the chained iterations
    ITERS = int(os.environ.get("BENCH_ITERS", "40"))
    primes = generate_primes_1mod(L, 35, 2 * N)
    plan = FourStepPlan.make(N, primes)
    impl = os.environ.get("BENCH_IMPL", "sliced")
    if impl == "sliced":
        # round-2 sliced-table fold kernel; data stays in the native
        # [L, B, n1, n2] u32-pair tile layout across chained calls (the
        # [L,B,N] reshape around the Mosaic call costs a real XLA copy).
        # Pin the schedule knobs off so ambient MFHE_SLICED_* env cannot
        # mislabel the base row (the auto-variant loop re-enables them
        # one pinned combination at a time).
        for _knob in ("MFHE_SLICED_DMA", "MFHE_SLICED_CTW",
                      "MFHE_SLICED_KARA_B"):
            os.environ.pop(_knob, None)
        ntt = SlicedFourStepNTT(plan)
        fwd = jax.jit(ntt.forward_pair4)
        inv = jax.jit(ntt.inverse_pair4)
        reshape4 = True
    elif impl == "pallas":
        ntt = PallasFourStepNTT(plan)  # round-1 fused Mosaic kernel
        fwd = jax.jit(ntt.forward_pair)
        inv = jax.jit(ntt.inverse_pair)
        reshape4 = False
    else:
        ntt = FourStepNTT(plan)        # XLA-composed chunked matmuls
        fwd = jax.jit(lambda lo, hi: split_u64(ntt.forward(join_u64(lo, hi))))
        inv = jax.jit(lambda lo, hi: split_u64(ntt.inverse(join_u64(lo, hi))))
        reshape4 = False

    rng = np.random.default_rng(0)
    x = np.stack(
        [rng.integers(0, q, size=(B, N), dtype=np.uint64) for q in primes])
    lo, hi = split_u64(jnp.asarray(x))
    if reshape4:
        lo = jnp.asarray(np.asarray(lo).reshape(L, B, plan.n1, plan.n2))
        hi = jnp.asarray(np.asarray(hi).reshape(L, B, plan.n1, plan.n2))

    def measure(fwd, inv, iters, tag, lo=lo, hi=hi, x=x):
        t0 = time.time()
        a, b = fwd(lo, hi)
        _ = jax.device_get(a.ravel()[:1])
        if not fence_done.is_set():  # device responded: disarm the watchdog
            fence_done.set()
            if wd_timer is not None:
                wd_timer.cancel()
        sys.stderr.write(f"[bench] {tag}: compile+first run "
                         f"{time.time()-t0:.1f}s\n")
        # chained steady-state timing, fenced by a readback
        t0 = time.perf_counter()
        a, b = lo, hi
        for _ in range(iters):
            a, b = fwd(a, b)
        _ = jax.device_get(a.ravel()[:1])
        sec = (time.perf_counter() - t0) / iters
        sys.stderr.write(f"[bench] {tag}: forward {sec*1e3:.2f} ms "
                         f"for {L*B} NTTs ({(L*B)/sec:,.0f}/s)\n")
        # correctness fence: roundtrip must be exact
        back = np.asarray(join_u64(*inv(*fwd(lo, hi)))).reshape(x.shape)
        assert (back == x).all(), f"NTT roundtrip mismatch ({tag})"
        return (L * B) / sec

    ntts_per_sec = measure(fwd, inv, ITERS, impl)
    variants = {impl: round(ntts_per_sec, 1)}
    best_tag = impl
    variant_envs = {}
    # sweep-truncation visibility (VERDICT r4 Weak #7): a cold-cache run
    # that exhausts the variant budget must be distinguishable in the
    # artifact from a complete sweep
    variants_skipped = []
    budget_exhausted = False

    def _record():  # keep the SIGTERM partial line current
        results.update(value=round(ntts_per_sec, 1), unit="NTT/s",
                       vs_baseline=round(ntts_per_sec / 1_000_000.0, 6),
                       ntt_variant=best_tag, ntt_variants=variants,
                       variants_skipped=variants_skipped,
                       budget_exhausted=budget_exhausted)

    _record()

    # Auto-variant selection (round 3): the fastest Mosaic schedule for the
    # sliced kernel depends on real-chip co-issue behaviour that can only be
    # measured on hardware; try the explicit-DMA double-buffered and
    # canonical-twiddle variants and report the best.  BENCH_AUTOVAR=0 skips.
    if (impl == "sliced" and os.environ.get("BENCH_AUTOVAR", "1") == "1"
            and jax.default_backend() != "cpu"):
        # each variant pins ALL schedule knobs so ambient MFHE_SLICED_* env
        # cannot mislabel a measurement (review r3)
        _off = {"MFHE_SLICED_DMA": "0", "MFHE_SLICED_CTW": "0",
                "MFHE_SLICED_KARA_B": "0"}
        variant_envs.update({
            "sliced": dict(_off),
            "sliced+dma": {**_off, "MFHE_SLICED_DMA": "1"},
            "sliced+ctw": {**_off, "MFHE_SLICED_CTW": "1"},
            "sliced+ctw+dma": {**_off, "MFHE_SLICED_CTW": "1",
                               "MFHE_SLICED_DMA": "1"},
            # mixed schedule: sliced stage A + Karatsuba convolution
            # stage B (the projected-best form if Mosaic co-issues
            # MXU/VPU — docs/PERF.md round 3)
            "sliced+karaB": {**_off, "MFHE_SLICED_KARA_B": "1"},
            "sliced+karaB+dma": {**_off, "MFHE_SLICED_KARA_B": "1",
                                 "MFHE_SLICED_DMA": "1"},
        })
        # time-budget the sweep: 6 variants x 2 cold Mosaic compiles through
        # the remote-AOT tunnel can threaten the driver's watchdog window on
        # a cold cache (VERDICT r3 Weak #5); the best-so-far is always
        # recorded, so truncating the sweep only loses untried variants
        var_budget = float(os.environ.get("BENCH_VARIANT_BUDGET_S", "420"))
        var_t0 = time.time()
        pending = list(variant_envs.items())[1:]
        for i, (tag, env) in enumerate(pending):
            if time.time() - var_t0 > var_budget:
                budget_exhausted = True
                variants_skipped.extend(t for t, _ in pending[i:])
                _record()
                sys.stderr.write(f"[bench] variant budget ({var_budget:.0f}s)"
                                 f" exhausted; skipping {tag} onward\n")
                break
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                ntt_v = SlicedFourStepNTT(plan)
                v = measure(jax.jit(ntt_v.forward_pair4),
                            jax.jit(ntt_v.inverse_pair4),
                            max(10, ITERS // 2), tag)
                variants[tag] = round(v, 1)
                if v > ntts_per_sec:
                    ntts_per_sec, best_tag = v, tag
                _record()
            except Exception as e:  # variant broken on this toolchain: skip
                sys.stderr.write(f"[bench] {tag} failed: {e}\n")
                variants[tag] = None
            finally:
                for k, old in saved.items():
                    if old is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = old

    extra = {}

    # TPU-native width variant (round 3): the baseline pins N=2^16, L=16
    # but not the modulus width.  28-bit primes (16 x 28 = 448 total bits —
    # still MORE precision than the reference's 395-bit Q chain) cut the
    # int8 digit grid from 5x5 to 4x4, the arithmetic floor by 36%.
    # Reported as an extra metric; the headline stays at the
    # reference-matching 35-bit width.
    if (os.environ.get("BENCH_28BIT", "1") == "1"
            and jax.default_backend() != "cpu"):
        try:
            primes28 = generate_primes_1mod(L, 28, 2 * N)
            plan28 = FourStepPlan.make(N, primes28)
            # run the 28-bit row under the schedule that won the 35-bit
            # sweep (same kernel machinery; at 28-bit karaB uses the
            # _Karatsuba4 10-dot grid)
            env28 = variant_envs.get(best_tag, {})
            saved28 = {k: os.environ.get(k) for k in env28}
            os.environ.update(env28)
            n28 = SlicedFourStepNTT(plan28)
            for k, old in saved28.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old
            x28 = np.stack([rng.integers(0, q, size=(B, N), dtype=np.uint64)
                            for q in primes28])
            lo28, hi28 = split_u64(jnp.asarray(x28))
            lo28 = jnp.asarray(np.asarray(lo28).reshape(
                L, B, plan28.n1, plan28.n2))
            hi28 = jnp.asarray(np.asarray(hi28).reshape(
                L, B, plan28.n1, plan28.n2))
            v28 = measure(jax.jit(n28.forward_pair4),
                          jax.jit(n28.inverse_pair4),
                          max(10, ITERS // 2), "sliced-28bit",
                          lo=lo28, hi=hi28, x=x28)
            extra["ntt_28bit_per_sec"] = round(v28, 1)
        except Exception as e:  # never let the extra metric kill the bench
            sys.stderr.write(f"[bench] 28-bit variant failed: {e}\n")

    if os.environ.get("MFHE_BENCH_REF", "1") == "1":
        # ref-preset regression gate (VERDICT r1 #5): the flagship
        # encode->encrypt->decrypt->decode pipeline at full reference
        # parameters must stay under the src/main.cu:150 1e-4 contract.
        try:
            t0 = time.time()
            from matrix_fhe_tpu import init_he_backend
            from matrix_fhe_tpu.config import get_params
            p = get_params("ref")
            ctx = init_he_backend("ref")
            sk = ctx.generate_secret_key()
            r = np.random.default_rng(7)
            re = r.uniform(-4, 4, size=(p.phi, p.n, p.n))
            im = r.uniform(-4, 4, size=(p.phi, p.n, p.n))
            # upload once: per-call host->device transfers through the
            # tunnel cost ~0.5 s for these 33 MB arrays
            rej = jax.device_put(jnp.asarray(re))
            imj = jax.device_put(jnp.asarray(im))
            dr, di = ctx.roundtrip(rej, imj, sk)
            _ = jax.device_get(dr[:1, :1, :1])
            t_first = time.time() - t0
            # measure the tunnel readback fence in situ (ADVICE r2: no
            # hardcoded fudge) on the already-computed output
            t0 = time.perf_counter()
            _ = jax.device_get(dr[:1, :1, :1])
            fence_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(5):  # amortize tunnel dispatch + the one fence
                dr, di = ctx.roundtrip(rej, imj, sk)
            _ = jax.device_get(dr[:1, :1, :1])
            rt_ms = (time.perf_counter() - t0 - fence_s) / 5 * 1e3
            err = float(np.hypot(np.asarray(dr) - re,
                                 np.asarray(di) - im).max())
            assert err < 1e-4, f"ref pipeline err {err} >= 1e-4"
            extra.update({"ref_roundtrip_ms": round(rt_ms, 1),
                          "ref_roundtrip_err": float(f"{err:.2e}")})
            sys.stderr.write(f"[bench] ref roundtrip: {rt_ms:.1f} ms, "
                             f"err {err:.2e} (first+compile {t_first:.0f}s)\n")
        except Exception as e:  # pragma: no cover - report, don't mask NTT
            sys.stderr.write(f"[bench] ref gate FAILED: {e}\n")
            extra["ref_gate_error"] = str(e)[:200]

    print(json.dumps({
        "metric": "NTTs/sec/chip (N=2^16, L=16, negacyclic, 35-bit primes)",
        "value": round(ntts_per_sec, 1),
        "unit": "NTT/s",
        "vs_baseline": round(ntts_per_sec / 1_000_000.0, 6),
        "ntt_variant": best_tag,
        "ntt_variants": variants,
        "variants_skipped": variants_skipped,
        "budget_exhausted": budget_exhausted,
        **extra,
    }))


if __name__ == "__main__":
    main()
