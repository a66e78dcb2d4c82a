"""Timing harness.

The reference planned one (include/utils/timer.h) but left it a 0-byte
placeholder and ships no timing code at all (SURVEY §5/§6); this fills the
gap with device-synchronized wall-clock measurement for jitted functions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


class Timer:
    """Accumulating named wall-clock timer with block_until_ready fencing."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, fence=None):
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals):
            lines.append(f"{k}: {self.totals[k] * 1e3:.2f} ms "
                         f"({self.counts[k]} calls)")
        return "\n".join(lines)


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds/call of a jitted function.

    Fences the LAST output with a device->host readback: through remote-TPU
    tunnels, block_until_ready can return before execution, and device_get
    costs ~30 ms flat — so fence exactly once and amortize over `iters`
    (see docs/PERF.md).  The 30 ms readback is NOT subtracted; use large
    `iters` for sub-ms workloads."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters
