#!/usr/bin/env python
"""Microbenchmark: in-kernel VPU i32 throughput + copy bandwidth on the
real chip.  Calibrates the op budget for the fused NTT fold redesign.

Usage:  python scripts/micro_vpu.py [ops...]
Prints per-variant: ms per pass, effective GB/s, effective i32 Gops/s.
"""
import os
import sys
import time

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "xla")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, B, N1, N2 = 16, 128, 256, 256  # same footprint as the NTT bench

    def make(kind, k):
        def kern(x_ref, o_ref):
            v = x_ref[0, 0]
            if kind == "copy":
                o_ref[0, 0] = v
                return
            acc = v
            if kind == "addmul":           # alternating add/mul chain
                for i in range(k):
                    acc = acc * np.uint32(2654435761) + np.uint32(i | 1)
            elif kind == "shift":          # shift/and/or chain
                for i in range(k):
                    acc = ((acc >> np.uint32(1 + (i % 5))) |
                           (acc << np.uint32(3))) & np.uint32(0x7FFFFFFF)
            elif kind == "cmpadd":         # carry-style: add + compare + add
                c = v
                for i in range(k):
                    s = acc + c
                    cc = (s < c).astype(jnp.uint32)
                    acc = s
                    c = cc + np.uint32(i)
            o_ref[0, 0] = acc

        spec = pl.BlockSpec((1, 1, N1, N2), lambda l, b: (l, b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(L, B), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((L, B, N1, N2), jnp.uint32))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=(L, B, N1, N2), dtype=np.uint64)
                    .astype(np.uint32))
    variants = [("copy", 0), ("addmul", 32), ("addmul", 128),
                ("shift", 128), ("cmpadd", 48), ("addmul", 512)]
    ITERS = int(os.environ.get("ITERS", "30"))
    for kind, k in variants:
        with jax.enable_x64(False):
            f = jax.jit(make(kind, k))
        y = f(x)
        _ = jax.device_get(y[0, 0, :1, :1])
        t0 = time.perf_counter()
        y = x
        for _ in range(ITERS):
            y = f(y)
        _ = jax.device_get(y[0, 0, :1, :1])
        dt = (time.perf_counter() - t0 - 0.03) / ITERS
        el = L * B * N1 * N2
        gbs = 2 * 4 * el / dt / 1e9
        ops = {"copy": 0, "addmul": 2 * k, "shift": 3 * k,
               "cmpadd": 3 * k}[kind] * el
        print(f"{kind:8s} k={k:4d}: {dt*1e3:8.3f} ms  {gbs:7.1f} GB/s  "
              f"{ops/dt/1e12:7.3f} Tops(i32)  "
              f"{dt/ (L*B) *1e6:6.2f} us/cell")


if __name__ == "__main__":
    main()
