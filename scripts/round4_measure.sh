#!/bin/bash
# Round-4 measurement sequence for the real chip (run the moment the axon
# tunnel answers).  Supersedes scripts/round3_measure.sh: same ordered
# core (cheapest/most-informative first) plus the round-4 additions —
# the mixed Karatsuba-stage-B kernel variants (bench.py tries them
# automatically), the 2-host scaling cost model with a measured anchor,
# and the ref-scale gl2 flagship GEMM.  Each step appends to
# /tmp/r4_measure.log and is individually timeout-guarded.
set -x
LOG=/tmp/r4_measure.log
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=.cache/xla

log() { echo "=== $* $(date +%H:%M:%S)" | tee -a $LOG; }

log "0. device sanity"
timeout 600 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a $LOG

log "1. co-issue microbenchmark (the schedule-variant decision point:
    co-issue present -> expect sliced+karaB to win; absent -> sliced/+dma)"
timeout 1800 python scripts/micro_coissue.py --reps 8 --grid 64 2>&1 | tail -12 | tee -a $LOG

log "2. NTT bench with auto-variant (sliced / +dma / +ctw / +ctw+dma /
    +karaB / +karaB+dma) + 28-bit width row + ref roundtrip"
timeout 2400 python bench.py 2>&1 | tail -3 | tee -a $LOG

log "3. distributed rows + 2-host cost model with the fresh measured anchor"
timeout 2400 python bench_dist.py 2>&1 | tail -3 | tee -a $LOG

log "4. trace cgemm via examples/matmul.py"
timeout 2400 python examples/matmul.py 2>&1 | tail -6 | tee -a $LOG

log "5. keyswitch phase table at mid (grid-aware P: 6x28-bit, dnum=1;
    compare round-2's 117.6 ms on 3x44-bit)"
timeout 2400 python scripts/ks_phases.py mid 5 2>&1 | tail -12 | tee -a $LOG

log "5b. full 11-limb ref-chain relinearization (streamed, pinned parity P
     — now all-Pallas incl. the 55-bit prime)"
timeout 3000 python examples/relinearize.py ref 2>&1 | tail -8 | tee -a $LOG

log "5b2. ref chain with the grid-aware auto P (14x28-bit, dnum=1, 0.84 GB
     keys — fused non-streamed path)"
MFHE_AUTO_P=1 MFHE_RELIN_STREAM=0 timeout 3000 python examples/relinearize.py ref 2>&1 | tail -8 | tee -a $LOG

log "5c. gl2 ciphertext-in/ciphertext-out GEMM at mid"
timeout 3000 python examples/matmul_gl2.py mid 2>&1 | tail -8 | tee -a $LOG

log "5c2. gl2 GEMM at REF scale (the flagship beyond-reference number:
     latency + error + key sizes — VERDICT r3 Next #5; auto-P required
     to fit the [m,m]-grid switch keys in one chip's HBM)"
MFHE_AUTO_P=1 timeout 4800 python examples/matmul_gl2.py ref 2>&1 | tail -8 | tee -a $LOG

log "5d. leveled chain depth-2 demo at mid"
timeout 2400 python examples/leveled.py mid 2>&1 | tail -5 | tee -a $LOG

log "5d2. roundtrip phase ablation (where do the post-words-chaining
     milliseconds live — drives the <25 ms work)"
timeout 2400 python scripts/rt_phases.py ref 5 2>&1 | tail -10 | tee -a $LOG

log "5e. OPTIONAL roundtrip lever: 5-digit fp transforms (MFHE_FP_XBITS=31,
    17% MXU cut on encode/decode kernels) — record (ms, err) and adopt
    only if err stays well under the 1e-4 contract"
MFHE_FP_XBITS=31 timeout 2400 python - <<'PYEOF' 2>&1 | tail -3 | tee -a $LOG
import time
import numpy as np, jax, jax.numpy as jnp
from matrix_fhe_tpu import init_he_backend
from matrix_fhe_tpu.config import get_params
p = get_params("ref"); ctx = init_he_backend("ref")
sk = ctx.generate_secret_key()
rng = np.random.default_rng(7)
re = rng.uniform(-500, 500, size=(p.phi, p.n, p.n))
im = rng.uniform(-500, 500, size=(p.phi, p.n, p.n))
rj, ij = jnp.asarray(re), jnp.asarray(im)
dr, di = ctx.roundtrip(rj, ij, sk)     # compile + correctness
err = np.hypot(np.asarray(dr) - re, np.asarray(di) - im).max()
t0 = time.perf_counter()
for _ in range(5):
    dr, di = ctx.roundtrip(rj, ij, sk)
_ = jax.device_get(dr.ravel()[:1])
ms = (time.perf_counter() - t0) / 5 * 1e3
print(f"ref roundtrip MFHE_FP_XBITS=31: {ms:.1f} ms, err {err:.2e}")
PYEOF

log "6. ref roundtrip exactness through the words-chained encode/decode"
timeout 2400 python - <<'PYEOF' 2>&1 | tail -3 | tee -a $LOG
import numpy as np, jax.numpy as jnp
from matrix_fhe_tpu import init_he_backend
from matrix_fhe_tpu.config import get_params
p = get_params("ref"); ctx = init_he_backend("ref")
sk = ctx.generate_secret_key()
rng = np.random.default_rng(7)
re = rng.uniform(-4, 4, size=(p.phi, p.n, p.n))
im = rng.uniform(-4, 4, size=(p.phi, p.n, p.n))
dr, di = ctx.roundtrip(jnp.asarray(re), jnp.asarray(im), sk)
print("ref roundtrip max err",
      np.hypot(np.asarray(dr) - re, np.asarray(di) - im).max())
PYEOF

log "done"
