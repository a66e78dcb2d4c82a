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


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ref"

    # Phase 1 (un-forced, CPU path): build shapes + parity streams eagerly.
    from matrix_fhe_tpu import models
    from matrix_fhe_tpu.config import get_params
    from matrix_fhe_tpu.models.he import HEContext

    p = get_params(name)
    ctx0 = HEContext(p)
    sk = ctx0.generate_secret_key()
    streams = (ctx0._parity_a_eval_pair,
               None if ctx0.zero_noise else ctx0._parity_e_eval_pair)

    def abstract(x):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), x)

    # Phase 2 (forced TPU path): fresh context, trace + lower only.
    os.environ["MFHE_FORCE_TPU_PATH"] = "1"
    ctx = HEContext(p)
    m = jax.ShapeDtypeStruct((p.phi, p.n, p.n), jnp.float64)
    exp = jax.export.export(ctx._roundtrip_streams_jit, platforms=("tpu",))(
        m, m, abstract(sk), abstract(streams))
    mod = exp.mlir_module()

    calls = re.findall(
        r'stablehlo\.custom_call @tpu_custom_call\((.*?)\).*?->\s*'
        r'((?:tuple<)?[^\n]*?)(?:\s*loc|\n)',
        mod)
    # payloads live in the backend_config attribute; pair each call with it
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

    print(f"preset={name}  module_bytes={len(mod)}")
    print(f"tpu_custom_call sites: {sum(by_payload.values())}")
    print(f"DISTINCT Mosaic payloads: {len(by_payload)}")
    for h, cnt in by_payload.most_common():
        print(f"  {h}  x{cnt:<3} -> {shape_of[h]}")


if __name__ == "__main__":
    main()
