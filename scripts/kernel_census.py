"""Offline Mosaic compile-budget census (docs/PERF.md round 3).

Cross-platform-lowers the TPU-shaped ref roundtrip from a CPU-only host
(jax.export with platforms=("tpu",), MFHE_FORCE_TPU_PATH=1) and counts the
DISTINCT Mosaic kernel payloads in the module: XLA compiles one Mosaic
binary per unique payload, so the cold-compile bill scales with unique
payloads, not pallas_call sites.  Two same-shape kernel instances that
lower to byte-identical payloads are free; this script names the ones that
are not, so they can be made identical.

Usage: python scripts/kernel_census.py [preset=ref]
"""

import collections
import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()
import jax

jax.config.update("jax_platforms", "cpu")
import jax.export
import jax.numpy as jnp
import numpy as np


def _payloads(mod):
    sites = re.findall(
        r'@tpu_custom_call.*?backend_config\s*=\s*"((?:[^"\\]|\\.)*)"'
        r'.*?->\s*([^\n{]*)', mod)
    if not sites:  # attribute form differs between versions; fall back
        sites = [(m_, "?") for m_ in re.findall(
            r'payload[^"]*"((?:[^"\\]|\\.)*)"', mod)]
    by_payload = collections.Counter()
    shape_of = {}
    for cfg, out in sites:
        h = hashlib.sha256(cfg.encode()).hexdigest()[:12]
        by_payload[h] += 1
        shape_of.setdefault(h, out.strip()[:90])
    return by_payload, shape_of


def _report(tag, mod):
    by_payload, shape_of = _payloads(mod)
    print(f"[{tag}] module_bytes={len(mod)}")
    print(f"[{tag}] tpu_custom_call sites: {sum(by_payload.values())}")
    print(f"[{tag}] DISTINCT Mosaic payloads: {len(by_payload)}")
    for h, cnt in by_payload.most_common():
        print(f"  {h}  x{cnt:<3} -> {shape_of[h]}")
    return set(by_payload)


def abstract(x):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), x)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ref"
    want_ks = "--keyswitch" in sys.argv

    # Phase 1 (un-forced, CPU path): build shapes + parity streams eagerly.
    from matrix_fhe_tpu.config import get_params
    from matrix_fhe_tpu.models.he import HEContext

    p = get_params(name)
    ctx0 = HEContext(p)
    sk = ctx0.generate_secret_key()
    streams = (ctx0._parity_a_eval_pair,
               None if ctx0.zero_noise else ctx0._parity_e_eval_pair)

    # Phase 2 (forced TPU path): fresh context, trace + lower only.
    os.environ["MFHE_FORCE_TPU_PATH"] = "1"
    ctx = HEContext(p)
    m = jax.ShapeDtypeStruct((p.phi, p.n, p.n), jnp.float64)
    exp = jax.export.export(ctx._roundtrip_streams_jit, platforms=("tpu",))(
        m, m, abstract(sk), abstract(streams))
    print(f"preset={name}")
    rt = _report("roundtrip", exp.mlir_module())

    if want_ks:
        # keyswitch pipeline over the QP basis, abstract key material
        import jax.numpy as jnp_
        from matrix_fhe_tpu.models.he import Ciphertext, HEContext as HC
        from matrix_fhe_tpu.models.keyswitch import RelinContext, RelinKey

        nctx = HC(p, ring="nega")
        rc = RelinContext(nctx)
        L, W, n = len(p.moduli), p.phi, p.n
        lqp = len(rc.qp_moduli)
        u64 = jnp.uint64
        ct = Ciphertext(b=jax.ShapeDtypeStruct((L, W, n, n), u64),
                        a=jax.ShapeDtypeStruct((L, W, n, n), u64))
        digit = jax.ShapeDtypeStruct((lqp, W, n, n), u64)
        rlk = RelinKey(b=(digit,) * rc.dnum, a=(digit,) * rc.dnum)
        exp2 = jax.export.export(rc._multiply_relinearize_jit,
                                 platforms=("tpu",))(ct, ct, rlk)
        ks = _report("multiply_relinearize", exp2.mlir_module())
        print(f"[overlap] shared payloads with roundtrip: "
              f"{len(rt & ks)} of {len(ks)}")


if __name__ == "__main__":
    main()
