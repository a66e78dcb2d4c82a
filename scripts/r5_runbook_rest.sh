#!/bin/bash
# Round-5 runbook steps 3-5e (everything except the NTT diagnostics/bench,
# which ran separately).  Serial: the axon tunnel is single-client.
set -x
LOG=/tmp/r5_rest.log
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=.cache/xla

log() { echo "=== $* $(date +%H:%M:%S)" | tee -a $LOG; }

log "3. distributed rows + 2-host cost model"
timeout 2400 python bench_dist.py 2>&1 | tail -3 | tee -a $LOG

log "4. trace cgemm via examples/matmul.py (r2: 46.9 ms)"
timeout 2400 python examples/matmul.py 2>&1 | tail -6 | tee -a $LOG

log "5. keyswitch phase table at mid (grid-aware P: dnum=1; r2: 117.6 ms)"
timeout 2400 python scripts/ks_phases.py mid 5 2>&1 | tail -12 | tee -a $LOG

log "5b. full 11-limb ref-chain relinearization (pinned parity P)"
timeout 3000 python examples/relinearize.py ref 2>&1 | tail -8 | tee -a $LOG

log "5b2. ref chain with grid-aware auto P (14x28-bit, dnum=1, fused)"
MFHE_AUTO_P=1 MFHE_RELIN_STREAM=0 timeout 3000 python examples/relinearize.py ref 2>&1 | tail -8 | tee -a $LOG

log "5c. gl2 ciphertext GEMM at mid"
timeout 3000 python examples/matmul_gl2.py mid 2>&1 | tail -8 | tee -a $LOG

log "5c2. gl2 GEMM at REF scale (flagship, never yet measured)"
MFHE_AUTO_P=1 timeout 4800 python examples/matmul_gl2.py ref 2>&1 | tail -8 | tee -a $LOG

log "5d. leveled chain depth-2 demo at mid"
timeout 2400 python examples/leveled.py mid 2>&1 | tail -5 | tee -a $LOG

log "5d2. roundtrip phase ablation (attributes the 28.8 ms)"
timeout 2400 python scripts/rt_phases.py ref 5 2>&1 | tail -12 | tee -a $LOG

log "5e. roundtrip lever: 5-digit fp transforms (adopt only if err << 1e-4)"
MFHE_FP_XBITS=31 timeout 2400 python scripts/rt_phases.py ref 5 2>&1 | tail -12 | tee -a $LOG

log "done"
