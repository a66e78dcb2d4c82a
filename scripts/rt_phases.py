"""Per-phase ablation of the ref roundtrip on the real chip.

The <25 ms roundtrip target (VERDICT r3 Next #6) needs to know where the
remaining milliseconds live AFTER the round-3 words-chaining landed; the
round-2 phase numbers (encode 13.3 / decode 16.3 / mul_s 4.9 / W-CRT 2.7,
docs/PERF.md) predate it.  This times each phase of the pair-native fast
path (he.py _roundtrip_pair_fn) as an independently jitted function with
honest tunnel fencing (utils/timer.benchmark), plus the fused full
roundtrip for the cross-check — phases need not sum exactly to the fused
time (XLA shares the a*s product between encrypt and decrypt inside the
fused graph; the split view double-counts it on purpose, it is the
decrypt-side mul_s lever).

Usage: python scripts/rt_phases.py [preset] [iters]    (default: ref 5)
Also honors MFHE_FP_XBITS to ablate the 5-digit fp-transform mode.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "xla")


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "ref"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    os.makedirs(CACHE, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from matrix_fhe_tpu import init_he_backend
    from matrix_fhe_tpu.config import get_params
    from matrix_fhe_tpu.ops import modmath as mm
    from matrix_fhe_tpu.utils.timer import benchmark

    p = get_params(preset)
    ctx = init_he_backend(preset)
    be = ctx.batched_encoder
    fast = (be.encoder.fast_float
            and getattr(ctx.xntt, "_mul_s_p", None) is not None)
    print(f"[rt-phases] preset={preset} fast_path={fast} "
          f"fp_xbits={os.environ.get('MFHE_FP_XBITS', '37')}")
    if not fast:
        print("[rt-phases] fast pair-native path inactive (CPU or "
              "MFHE_FP_TRANSFORMS=0) — phase numbers would not match the "
              "production roundtrip; aborting")
        return 1

    sk = ctx.generate_secret_key()
    rng = np.random.default_rng(7)
    m_re = jnp.asarray(rng.uniform(-500, 500, size=(p.phi, p.n, p.n)))
    m_im = jnp.asarray(rng.uniform(-500, 500, size=(p.phi, p.n, p.n)))

    t0 = time.time()
    streams = (ctx._parity_a_eval_pair, ctx._parity_e_eval_pair)
    print(f"[rt-phases] parity streams built in {time.time()-t0:.1f}s")

    # --- independently jitted phases ------------------------------------
    enc = jax.jit(be.encode_pair)

    def mul_s_fn(ael, aeh, sl, sh):
        return ctx.xntt.mul_s_pair(ael, aeh, sl, sh)

    mul_s = jax.jit(mul_s_fn)

    def combine_fn(pr, pi, t, e, sk_unused):
        ql, qh = mm.pair_consts(ctx.params.moduli, 3)
        (prl, prh), (pil, pih) = pr, pi
        tl, th = t
        eel, eeh = e
        evs = []
        for ml, mh in ((prl, prh), (pil, pih)):
            bl, bh = mm.pair_sub_mod(ml, mh, tl, th, ql, qh)
            bl, bh = mm.pair_add_mod(bl, bh, eel, eeh, ql, qh)
            evs.append(mm.pair_add_mod(bl, bh, tl, th, ql, qh))
        return evs

    combine = jax.jit(combine_fn)
    dec = jax.jit(be.decode_pair)

    # build real intermediates once (also compiles)
    pr, pi = enc(m_re, m_im)
    sl, sh = mm.pair_split(sk.s_mont)
    t = mul_s(*streams[0], sl, sh)
    evs = combine(pr, pi, t, streams[1], sk)
    out = dec(evs[0], evs[1])
    _ = jax.device_get(out[0].ravel()[:1])

    rows = {}
    rows["encode_pair"] = benchmark(enc, m_re, m_im, iters=iters)
    rows["mul_s (a*s, shared enc/dec)"] = benchmark(
        mul_s, *streams[0], sl, sh, iters=iters)
    rows["combine b/ev (VPU add/sub)"] = benchmark(
        combine, pr, pi, t, streams[1], sk, iters=iters)
    rows["decode_pair"] = benchmark(dec, evs[0], evs[1], iters=iters)
    rows["FUSED full roundtrip"] = benchmark(
        lambda a, b: ctx.roundtrip(a, b, sk), m_re, m_im, iters=iters)

    dr, di = ctx.roundtrip(m_re, m_im, sk)
    err = np.hypot(np.asarray(dr) - np.asarray(m_re),
                   np.asarray(di) - np.asarray(m_im)).max()
    width = max(len(k) for k in rows)
    for k, v in rows.items():
        print(f"[rt-phases] {k:<{width}} {v * 1e3:8.2f} ms")
    print(f"[rt-phases] roundtrip err {err:.2e} (contract 1e-4, "
          f"src/main.cu:150)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
