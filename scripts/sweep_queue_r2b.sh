#!/bin/bash
# Follow-up to sweep_queue_r2.sh: re-sweep every shape whose earlier sweep
# ran the pre-blocked-scale kernels (one-hot per-step scale selection,
# removed in "Blocked scale layout: static per-step scale slices").
# Affected: all fp8 nk>1 shapes from queue section 1 (the K=18432 family
# cannot take full-K blocks in VMEM) and the grouped contiguous/masked
# shapes (section 2 started before the kernel change; masked was swept in
# round 1). Fresh out-dir so the resumable checkpoints don't skip them.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
OUT=autotune_results_r3b
PY=python

echo "=== [1/3] fp8 K-blocked shapes (blocked-scale kernel) ==="
$PY scripts/autotune_sweep.py --op fp8_gemm --out-dir $OUT \
  --max-candidates 24 --iters 16 --min-chain 0.25 --shapes \
  128 7168 18432  256 7168 18432  512 7168 18432  2048 7168 18432 \
  64 7168 16384  1024 7168 18432

echo "=== [2/3] grouped contiguous (blocked-scale kernel) ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_contiguous --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  8 512 1408 2048  8 512 2048 1408  32 256 1408 2048  32 256 2048 1408

echo "=== [3/3] grouped masked (serving decode shapes) ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_masked --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  8 128 1408 2048  8 128 2048 1408  8 512 1408 2048  8 512 2048 1408 \
  32 96 2048 1408  32 96 2816 2048  32 384 2048 1408  32 384 2816 2048

echo "=== r2b queue done ==="
