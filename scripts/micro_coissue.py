"""MXU/VPU/DMA co-issue microbenchmark (run on the real chip).

The round-2 ablation of the fused sliced NTT kernel (docs/PERF.md) found
its component times SUM LINEARLY — Mosaic appears not to overlap the int8
MXU dots, the VPU fold, and the HBM DMA.  That no-overlap behavior caps
the two-stage kernel at ~230k NTT/s; the round-3 target (>=300k with a
written path to 1M, VERDICT.md Next #1) needs the overlap question
settled by direct measurement, not inferred from a production kernel.

Three kernel families on one [256, 256] u32 tile per grid cell:

  mxu(R):    R independent int8 [256,1280]x[1280,256] dots (i32 acc).
  vpu(R):    R rounds of a fold-like i32 chain (mul/shift/add/cmp mix).
  both(R):   the same R dots AND R chains interleaved, data-independent.
  dep(R):    chain r consumes dot r-1's result (the realistic pipeline).

If both(R) ~= max(mxu, vpu): Mosaic co-issues -> restructure the NTT
kernel so tile t+1's dots overlap tile t's fold.  If both ~= mxu + vpu:
the serialization is issue-order-hardware or compiler-level, and the 1M
path must instead cut MXU work (deeper radix) and VPU work (cheaper fold).

Also measures: dma(R) pure HBM->VMEM traffic via the automatic grid
pipeline, and dma+mxu to see whether block DMA hides under compute.

Usage:  python scripts/micro_coissue.py [--reps 8] [--grid 64]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 256          # tile side
K = 1280         # contraction depth (5 digit planes at radix 256)


def _vpu_round(a, b):
    """~a fold's worth of weighted VPU ops on two u32 planes."""
    m = (a & jnp.uint32(0x0FFFFFFF)) * jnp.uint32(0x9E3779B1)
    u = m + (b >> jnp.uint32(7))
    c = (u < m).astype(jnp.uint32)
    v = (u << jnp.uint32(4)) | (a >> jnp.uint32(28))
    w = v + c + (m >> jnp.uint32(28))
    ge = w > jnp.uint32(0x7FFFFFFF)
    return jnp.where(ge, w - jnp.uint32(0x7FFFFFFF), w), u


def _kern(d8_ref, t8_ref, a_ref, b_ref, o32_ref, ou_ref, *, reps: int,
          mode: str):
    acc = None
    a = a_ref[0]
    b = b_ref[0]
    if mode in ("mxu", "both", "dma+mxu"):
        for r in range(reps):
            d = jax.lax.dot_general(
                d8_ref[0, r % d8_ref.shape[1]], t8_ref[0, r % t8_ref.shape[1]],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
            if mode == "both":
                a, b = _vpu_round(a, b)
    elif mode == "vpu":
        for _ in range(reps):
            a, b = _vpu_round(a, b)
    elif mode == "dep":
        for r in range(reps):
            d = jax.lax.dot_general(
                d8_ref[0, r % d8_ref.shape[1]], t8_ref[0, r % t8_ref.shape[1]],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
            a, b = _vpu_round(a ^ acc.astype(jnp.uint32), b)
    elif mode == "dma":
        pass
    o32_ref[0] = jnp.zeros((N, N), jnp.int32) if acc is None else acc
    ou_ref[0] = a


def build(mode: str, reps: int, grid: int, planes: int = 2):
    kern = functools.partial(_kern, reps=reps, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, planes, N, K), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes, K, N), lambda g: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, N, N), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, N, N), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((grid, N, N), jnp.int32),
                   jax.ShapeDtypeStruct((grid, N, N), jnp.uint32)),
        interpret=jax.default_backend() == "cpu",
    )


def bench(fn, args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(out[1][0, 0, :1])  # one readback fence
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    planes = 2
    d8 = jnp.asarray(rng.integers(-100, 100, (args.grid, planes, N, K),
                                  dtype=np.int8))
    t8 = jnp.asarray(rng.integers(-100, 100, (1, planes, K, N),
                                  dtype=np.int8))
    a = jnp.asarray(rng.integers(0, 1 << 32, (args.grid, N, N),
                                 dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, (args.grid, N, N),
                                 dtype=np.uint32))

    results = {}
    for mode in ("dma", "mxu", "vpu", "both", "dep", "dma+mxu"):
        f = jax.jit(build(mode, args.reps, args.grid))
        dt = bench(f, (d8, t8, a, b), args.iters)
        per_cell = dt / args.grid * 1e6
        results[mode] = per_cell
        print(f"{mode:8s} {per_cell:8.2f} us/cell   ({dt*1e3:.2f} ms total)")

    mxu, vpu, both = results["mxu"], results["vpu"], results["both"]
    base = results["dma"]
    # the dma-only cell sometimes measures pathologically slow on the
    # tunnel (r4: 60 ms/cell vs 28 us for mxu) — an empty kernel body
    # denies Mosaic's pipeliner anything to hide the block DMA under, so
    # it is NOT a valid fixed-cost baseline; fall back to base=0 when it
    # exceeds the compute cells (fraction then *understates* overlap)
    if base > min(mxu, vpu):
        print(f"\n[dma cell {base:.0f} us/cell > compute cells -- "
              "ignoring it as a baseline]")
        base = 0.0
    overlap = (mxu + vpu - base - both) / max(min(mxu, vpu) - base, 1e-9)
    print(f"co-issue fraction (1 = perfect overlap, 0 = serial): "
          f"{overlap:.2f}")
    print(f"dots per rep: {N*K*N*2/1e9:.3f} Gop; "
          f"mxu rate ~= {args.reps*N*K*N*2/(mxu-base)/1e6:.0f} Top/s" if
          mxu > base else "")


if __name__ == "__main__":
    main()
