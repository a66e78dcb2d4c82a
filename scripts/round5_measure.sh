#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 "Next round" items, in order).
# Philosophy: diagnostics FIRST (they decide the kernel work), then the
# round-4 runbook steps that never produced a number, then re-measure.
# Each step appends to /tmp/r5_measure.log and is timeout-guarded; steps
# are independent so a failure never blocks the rest.
set -x
LOG=/tmp/r5_measure.log
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=.cache/xla

log() { echo "=== $* $(date +%H:%M:%S)" | tee -a $LOG; }

log "0. device sanity"
timeout 600 python -c "import jax; print(jax.devices())" 2>&1 | tail -1 | tee -a $LOG

log "1. per-component ablation at true 35-bit (VERDICT r4 Next #1: attribute
    the 135.7k-vs-225k-roof gap; env pinned per ADVICE r4)"
timeout 2400 python scripts/ntt_ablate.py 20 2>&1 | tail -10 | tee -a $LOG

log "1b. ILV/BB sweep (software-pipelined schedule rows)"
timeout 3600 bash scripts/ilv_sweep.sh 2>&1 | tail -30 | tee -a $LOG

log "2. full bench with auto-variant + 28-bit row + ref roundtrip"
timeout 2400 python bench.py 2>&1 | tail -3 | tee -a $LOG

log "3. distributed rows + 2-host cost model with the fresh measured anchor"
timeout 2400 python bench_dist.py 2>&1 | tail -3 | tee -a $LOG

log "4. trace cgemm via examples/matmul.py (r2: 46.9 ms)"
timeout 2400 python examples/matmul.py 2>&1 | tail -6 | tee -a $LOG

log "5. keyswitch phase table at mid (grid-aware P: dnum=1; r2: 117.6 ms)"
timeout 2400 python scripts/ks_phases.py mid 5 2>&1 | tail -12 | tee -a $LOG

log "5b. full 11-limb ref-chain relinearization (streamed, pinned parity P,
     all-Pallas incl. the 55-bit prime)"
timeout 3000 python examples/relinearize.py ref 2>&1 | tail -8 | tee -a $LOG

log "5b2. ref chain with grid-aware auto P (14x28-bit, dnum=1, fused)"
MFHE_AUTO_P=1 MFHE_RELIN_STREAM=0 timeout 3000 python examples/relinearize.py ref 2>&1 | tail -8 | tee -a $LOG

log "5c. gl2 ciphertext GEMM at mid"
timeout 3000 python examples/matmul_gl2.py mid 2>&1 | tail -8 | tee -a $LOG

log "5c2. gl2 GEMM at REF scale (flagship, never yet measured; auto-P to fit
     HBM; fused SlicedGemm2x2 Mosaic kernel)"
MFHE_AUTO_P=1 timeout 4800 python examples/matmul_gl2.py ref 2>&1 | tail -8 | tee -a $LOG

log "5d. leveled chain depth-2 demo at mid"
timeout 2400 python examples/leveled.py mid 2>&1 | tail -5 | tee -a $LOG

log "5d2. roundtrip phase ablation (attributes the 28.8 ms; drives <25 ms)"
timeout 2400 python scripts/rt_phases.py ref 5 2>&1 | tail -12 | tee -a $LOG

log "5e. roundtrip lever: 5-digit fp transforms (adopt only if err << 1e-4)"
MFHE_FP_XBITS=31 timeout 2400 python scripts/rt_phases.py ref 5 2>&1 | tail -12 | tee -a $LOG

log "done"
