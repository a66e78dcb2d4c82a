#!/bin/bash
# Round-4 on-chip sweep: (a) the MFHE_SLICED_ILV software-pipelined
# schedule (round-2 "neutral" at 36-bit; re-decided at true 35-bit where
# the MXU share is smaller), (b) the per-component ablation at true
# 35-bit (the round-2 ablation numbers were measured on 36-bit primes).
# Each row is a short bench.py run with the sweep/extra metrics disabled.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=.cache/xla
export BENCH_AUTOVAR=0 BENCH_28BIT=0 MFHE_BENCH_REF=0 BENCH_ITERS=20
# ambient variant knobs would silently swap (DMA) or abort (CTW/KARA_B)
# the kernel each row claims to measure
unset MFHE_SLICED_DMA MFHE_SLICED_CTW MFHE_SLICED_KARA_B MFHE_SLICED_ALIAS MFHE_SLICED_SEMANTICS MFHE_SLICED_ILV MFHE_SLICED_BB MFHE_SLICED_ABLATE

echo "=== ILV rows (interleaved software pipeline, bb tiles/cell)"
for bb in 2 4; do
  echo "--- ILV=1 BB=$bb"
  MFHE_SLICED_ILV=1 MFHE_SLICED_BB=$bb timeout 900 python bench.py 2>&1 | tail -2
done
echo "--- BB=2 (no ILV: control for the tile-unroll effect alone)"
MFHE_SLICED_BB=2 timeout 900 python bench.py 2>&1 | tail -2

echo "=== 35-bit component ablation (io / extract / dots / stage1 / tw / full)"
timeout 1800 python scripts/ntt_ablate.py 20 2>&1 | tail -10
echo "=== done"
