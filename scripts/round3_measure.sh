#!/bin/bash
# Round-3 measurement sequence for the real chip (run when the axon tunnel
# is back).  Each step appends to /tmp/r3_measure.log and is individually
# timeout-guarded so one hang doesn't eat the session.  Order matters:
# cheapest/most-informative first.
set -x
LOG=/tmp/r3_measure.log
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=.cache/xla

log() { echo "=== $* $(date +%H:%M:%S)" | tee -a $LOG; }

log "0. device sanity"
timeout 600 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a $LOG

log "1. co-issue microbenchmark (the round-3 decision point)"
timeout 1800 python scripts/micro_coissue.py --reps 8 --grid 64 2>&1 | tail -12 | tee -a $LOG

log "2. NTT bench: grid-pipelined (round-2 default)"
timeout 2400 python bench.py 2>&1 | tail -3 | tee -a $LOG

log "3. NTT bench: explicit-DMA double-buffered variant"
MFHE_SLICED_DMA=1 BENCH_AUTOVAR=0 timeout 2400 python bench.py 2>&1 | tail -3 | tee -a $LOG

log "4. trace cgemm (merged-dot form) via examples/matmul.py"
timeout 2400 python examples/matmul.py 2>&1 | tail -6 | tee -a $LOG

log "5. keyswitch phase table at mid (default P is now the grid-aware
    basis: 6x28-bit, dnum=1 — compare vs round-2's 117.6 ms on 3x44-bit)"
timeout 2400 python scripts/ks_phases.py mid 5 2>&1 | tail -12 | tee -a $LOG

log "5b. full 11-limb ref-chain relinearization (streamed, pinned parity P)"
timeout 3000 python examples/relinearize.py ref 2>&1 | tail -8 | tee -a $LOG

log "5b2. ref chain with the grid-aware auto P (14x28-bit, dnum=1, 0.84 GB
     keys — the fused non-streamed path should now fit one chip)"
MFHE_AUTO_P=1 MFHE_RELIN_STREAM=0 timeout 3000 python examples/relinearize.py ref 2>&1 | tail -8 | tee -a $LOG

log "5c. gl2 ciphertext-in/ciphertext-out GEMM at mid (VERDICT r2 #2)"
timeout 3000 python examples/matmul_gl2.py mid 2>&1 | tail -8 | tee -a $LOG

log "5d. leveled chain depth-2 demo at mid (LeveledChain, auto scale mgmt)"
timeout 2400 python examples/leveled.py mid 2>&1 | tail -5 | tee -a $LOG

log "6. roundtrip exactness through the words-chained encode/decode (ref)"
timeout 2400 python - <<'EOF' 2>&1 | tail -3 | tee -a $LOG
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
EOF

log "done"
