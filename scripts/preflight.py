"""Pre-flight the round-3 measurement programs without a TPU.

Cross-platform lowers (jax.export, platforms=("tpu",)) the core jit of each
program in scripts/round3_measure.sh from the CPU host with the TPU kernel
path forced.  This catches trace-time and Mosaic-lowering-time failures
(shape/width asserts, Mosaic legalization errors) before burning tunnel
time; it does NOT run the Mosaic compiler itself (that happens at XLA
compile time on the device).

Usage: python scripts/preflight.py [quick|full]
  quick (default): bench kernels + mid keyswitch + gl2 tiny
  full: adds the ref-preset programs (big tables; several minutes of host
        table building)
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()
import jax

jax.config.update("jax_platforms", "cpu")
import jax.export
import jax.numpy as jnp
import numpy as np

os.environ["MFHE_FORCE_TPU_PATH"] = "1"

PASS, FAIL = [], []


def check(name, fn, *args):
    try:
        jax.export.export(jax.jit(fn), platforms=("tpu",))(*args)
        PASS.append(name)
        print(f"  ok  {name}")
    except Exception as e:
        FAIL.append((name, e))
        print(f"FAIL  {name}: {type(e).__name__}: {e}")
        traceback.print_exc(limit=3)


def sd(shape, dtype=jnp.uint32):
    return jax.ShapeDtypeStruct(shape, dtype)


def main():
    full = len(sys.argv) > 1 and sys.argv[1] == "full"

    # --- bench kernels: all schedule variants + both widths ---------------
    from matrix_fhe_tpu.ops.ntt_large import FourStepPlan, generate_primes_1mod
    from matrix_fhe_tpu.ops.pallas_ntt import SlicedFourStepNTT

    N, L, B = 1 << 16, 16, 8
    for bits in (35, 28):
        primes = generate_primes_1mod(L, bits, 2 * N)
        plan = FourStepPlan.make(N, primes)
        args = (sd((L, B, plan.n1, plan.n2)), sd((L, B, plan.n1, plan.n2)))
        for tag, env in (("base", {}),
                         ("dma", {"MFHE_SLICED_DMA": "1"}),
                         ("ctw", {"MFHE_SLICED_CTW": "1"}),
                         ("ctw+dma", {"MFHE_SLICED_CTW": "1",
                                      "MFHE_SLICED_DMA": "1"}),
                         ("karaB", {"MFHE_SLICED_KARA_B": "1"}),
                         ("karaB+dma", {"MFHE_SLICED_KARA_B": "1",
                                        "MFHE_SLICED_DMA": "1"})):
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                ntt = SlicedFourStepNTT(plan)
                check(f"ntt{bits} {tag} fwd", ntt.forward_pair4, *args)
                check(f"ntt{bits} {tag} inv", ntt.inverse_pair4, *args)
            finally:
                for k, v in saved.items():
                    os.environ.pop(k, None) if v is None else \
                        os.environ.__setitem__(k, v)

    # --- mid keyswitch (new grid-aware default P) --------------------------
    from matrix_fhe_tpu.config import get_params
    from matrix_fhe_tpu.models.he import Ciphertext, HEContext
    from matrix_fhe_tpu.models.keyswitch import RelinContext, RelinKey

    p = get_params("mid")
    nctx = HEContext(p, ring="nega")
    rc = RelinContext(nctx)
    Lq, W, n = len(p.moduli), p.phi, p.n
    u64 = jnp.uint64
    ct = Ciphertext(b=sd((Lq, W, n, n), u64), a=sd((Lq, W, n, n), u64))
    digit = sd((len(rc.qp_moduli), W, n, n), u64)
    rlk = RelinKey(b=(digit,) * rc.dnum, a=(digit,) * rc.dnum)
    check(f"mid multiply_relinearize (dnum={rc.dnum})",
          rc._multiply_relinearize_fn, ct, ct, rlk)

    from matrix_fhe_tpu.models.keyswitch import _rescale_pipeline
    fn = _rescale_pipeline(nctx)
    check("mid rescale pipeline", fn,
          sd((Lq, W, n, n), u64), sd((Lq, W, n, n), u64))

    # Galois apply at mid (keygen-free: perms are pure functions of params)
    from matrix_fhe_tpu.models.keyswitch import (GaloisKeys,
                                                 w_automorphism_perm)
    j = 2
    gk = object.__new__(GaloisKeys)
    gk.rc = rc
    gk._keys = {}
    gk._perms = {j: jnp.asarray(w_automorphism_perm(p, j))}
    check("mid galois apply", lambda c, k: gk._apply_jit(j)(c, k),
          ct, RelinKey(b=(digit,) * rc.dnum, a=(digit,) * rc.dnum))

    # --- wide (55-bit ref parity P prime) SlicedStage ----------------------
    from matrix_fhe_tpu.config import REF_P_MODULI
    from matrix_fhe_tpu.ops.pallas_ntt import SlicedStage
    qw = REF_P_MODULI[0]
    rngw = np.random.default_rng(0)
    for wside, shape_t, shape_x in (("left", (1, 512, 512), (1, 512, 64)),
                                    ("right", (1, 128, 128), (1, 256, 128))):
        tblw = rngw.integers(0, qw, shape_t, dtype=np.uint64)
        stw = SlicedStage(tblw, (qw,), side=wside)
        check(f"wide55 sliced stage {wside}", stw,
              sd(shape_x), sd(shape_x))

    # --- gl2 GEMM+relin at tiny -------------------------------------------
    from matrix_fhe_tpu.models.he2 import Ciphertext2, Gl2Context
    from matrix_fhe_tpu.models.he_matmul2 import Gl2GemmRelin, GemmRelinKey, HEMatmul2

    pt = get_params("tiny")
    gctx = Gl2Context(pt)
    hm = HEMatmul2(gctx)
    gr = Gl2GemmRelin(hm)
    m = 2 * pt.n
    Lg, Wg = len(pt.moduli), pt.phi
    ct2 = Ciphertext2(b=sd((Lg, Wg, pt.n, m), u64),
                      a=sd((Lg, Wg, pt.n, m), u64))
    kdig = sd((len(gr.rc.qp_moduli), Wg, m, m), u64)
    ks = GemmRelinKey(b1=(kdig,) * gr.rc.dnum, a1=(kdig,) * gr.rc.dnum,
                      b2=(kdig,) * gr.rc.dnum, a2=(kdig,) * gr.rc.dnum)
    check("gl2 tiny gemm+relin",
          lambda a, b, k: gr.relinearize_fn(hm.tensor_fn(a, b), k),
          ct2, ct2, ks)

    # --- gl2 decrypt mul_s (the rep=64 fused kernel the GEMM demo drives
    # for encrypt/decrypt; its tile selection failed Mosaic's sublane rule
    # on chip in round 5 — coverage the gemm+relin checks don't give) -----
    check("gl2 tiny decrypt mul_s",
          lambda ct, s: gctx.xntt.mul_s(ct, s),
          sd((Lg, Wg, m, m), u64), sd((Lg, Wg, m), u64))

    if full:
        # --- gl2 GEMM+relin at MID (runbook step 5c geometry) -------------
        pm = get_params("mid")
        g2m = Gl2Context(pm)
        hmm = HEMatmul2(g2m)
        grm = Gl2GemmRelin(hmm)
        mm_dim = 2 * pm.n
        Lm, Wm = len(pm.moduli), pm.phi
        ct2m = Ciphertext2(b=sd((Lm, Wm, pm.n, mm_dim), u64),
                           a=sd((Lm, Wm, pm.n, mm_dim), u64))
        kdm = sd((len(grm.rc.qp_moduli), Wm, mm_dim, mm_dim), u64)
        ksm = GemmRelinKey(b1=(kdm,) * grm.rc.dnum, a1=(kdm,) * grm.rc.dnum,
                           b2=(kdm,) * grm.rc.dnum, a2=(kdm,) * grm.rc.dnum)
        check(f"gl2 MID gemm+relin (dnum={grm.rc.dnum}, "
              f"Lqp={len(grm.rc.qp_moduli)})",
              lambda a, b, k: grm.relinearize_fn(hmm.tensor_fn(a, b), k),
              ct2m, ct2m, ksm)
        # the rep=64 fused mul_s at the REAL mid geometry (n=64, K=2n=128)
        # — the kernel that failed on chip in round 5
        check("gl2 MID decrypt mul_s (rep=64)",
              lambda ct, s: g2m.xntt.mul_s(ct, s),
              sd((Lm, Wm, mm_dim, mm_dim), u64), sd((Lm, Wm, mm_dim), u64))

        # --- gl2 GEMM+relin at REF with the auto P (runbook step 5c2:
        # the pinned parity P would give dnum=4 / ~27 GB keys; the
        # flagship ref-scale run uses MFHE_AUTO_P=1) ---------------------
        prg = get_params("ref")
        g2r = Gl2Context(prg)
        hmr = HEMatmul2(g2r)
        grr = Gl2GemmRelin(hmr, RelinContext(g2r, p_moduli="auto"))
        mr = 2 * prg.n
        Lg2, Wg2 = len(prg.moduli), prg.phi
        ct2r = Ciphertext2(b=sd((Lg2, Wg2, prg.n, mr), u64),
                           a=sd((Lg2, Wg2, prg.n, mr), u64))
        kdr = sd((len(grr.rc.qp_moduli), Wg2, mr, mr), u64)
        ksr = GemmRelinKey(b1=(kdr,) * grr.rc.dnum, a1=(kdr,) * grr.rc.dnum,
                           b2=(kdr,) * grr.rc.dnum, a2=(kdr,) * grr.rc.dnum)
        check(f"gl2 REF gemm+relin auto-P (dnum={grr.rc.dnum}, "
              f"Lqp={len(grr.rc.qp_moduli)})",
              lambda a, b, k: grr.relinearize_fn(hmr.tensor_fn(a, b), k),
              ct2r, ct2r, ksr)

        # --- ref roundtrip + ref keyswitch with the PINNED parity P -------
        # two-phase (as kernel_census): keygen/streams execute eagerly, so
        # build them on the UN-forced CPU path, then export a fresh forced
        # context with abstract args of the same shapes
        os.environ["MFHE_FORCE_TPU_PATH"] = "0"
        ctx_cpu = HEContext(get_params("ref"))
        sk = ctx_cpu.generate_secret_key()
        streams = (ctx_cpu._parity_a_eval_pair, ctx_cpu._parity_e_eval_pair)
        ab = jax.tree.map(lambda a: sd(a.shape, a.dtype), (sk, streams))
        os.environ["MFHE_FORCE_TPU_PATH"] = "1"
        pr = get_params("ref")
        ctx0 = HEContext(pr)
        mm_ = sd((pr.phi, pr.n, pr.n), jnp.float64)
        check("ref roundtrip", ctx0._roundtrip_streams_jit,
              mm_, mm_, ab[0], ab[1])

        nref = HEContext(pr, ring="nega")
        rcr = RelinContext(nref)      # pinned P incl. the 55-bit prime
        Lr = len(pr.moduli)
        ctr = Ciphertext(b=sd((Lr, pr.phi, pr.n, pr.n), u64),
                         a=sd((Lr, pr.phi, pr.n, pr.n), u64))
        dig = sd((len(rcr.qp_moduli), pr.phi, pr.n, pr.n), u64)
        rlkr = RelinKey(b=(dig,) * rcr.dnum, a=(dig,) * rcr.dnum)
        check(f"ref multiply_relinearize pinned-P (dnum={rcr.dnum})",
              rcr._multiply_relinearize_fn, ctr, ctr, rlkr)

        rca = RelinContext(nref, p_moduli="auto")
        diga = sd((len(rca.qp_moduli), pr.phi, pr.n, pr.n), u64)
        rlka = RelinKey(b=(diga,) * rca.dnum, a=(diga,) * rca.dnum)
        check(f"ref multiply_relinearize auto-P (dnum={rca.dnum}, "
              f"Lqp={len(rca.qp_moduli)})",
              rca._multiply_relinearize_fn, ctr, ctr, rlka)

    print(f"\npreflight: {len(PASS)} ok, {len(FAIL)} failed")
    return 1 if FAIL else 0


if __name__ == "__main__":
    sys.exit(main())
