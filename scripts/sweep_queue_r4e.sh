#!/bin/bash
# Round-4 fifth sweep pass (VERDICT r3 missing #3 — off-prefix coverage
# for the LEARNED tier on the remaining ops; r4c already covers
# fp8_gemm_nt + bf16 gemm): --explore-extra resumes INTO the dirs that
# already hold each shape's prefix records, so config-keyed resume skips
# the done prefix and only the stratified off-prefix candidates burn chip
# time. Prefix-only training sets make holdout win-rate ≈ 0 BY
# CONSTRUCTION (docs/BENCHMARKS.md r3 analysis); these records are what
# the retrain (harvest_r4.sh) needs to demonstrate win-rate ≥ 0.5 or
# honestly drop the model per op.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
PY="bash scripts/py_retry.sh"

echo "=== [1/3] fp8_gemm off-prefix (flagship; resume r3 dir) ==="
$PY scripts/autotune_sweep.py --op fp8_gemm --out-dir autotune_results_r3 \
  --max-candidates 14 --explore-extra 6 --iters 16 --min-chain 0.25 --shapes \
  4096 4096 4096    128 4096 7168   1024 4096 7168  8192 4096 7168 \
  256 18432 7168    512 7168 18432  2048 7168 18432 3511 6151 8191

echo "=== [2/3] fp8_gemm off-prefix small-M rows (resume r2 dir) ==="
$PY scripts/autotune_sweep.py --op fp8_gemm --out-dir autotune_results_r2 \
  --max-candidates 14 --explore-extra 6 --iters 16 --min-chain 0.25 --shapes \
  64 512 2048   64 24576 1536   64 4096 7168   64 7168 18432

echo "=== [3/3] grouped contiguous + masked off-prefix (resume r3b) ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_contiguous \
  --out-dir autotune_results_r3b \
  --max-candidates 16 --explore-extra 6 --iters 16 --min-chain 0.25 --shapes \
  8 512 1408 2048  8 512 2048 1408
$PY scripts/autotune_sweep.py --op grouped_gemm_masked \
  --out-dir autotune_results_r3b \
  --max-candidates 16 --explore-extra 6 --iters 16 --min-chain 0.25 --shapes \
  8 128 1408 2048  8 128 2048 1408

echo "=== [4/4] int8 W8A8 headline + serving shapes (NEW op; the MXU ==="
echo "    int8 path runs 394 TOPS = 2x the bf16/fp8 rate)            ==="
$PY scripts/autotune_sweep.py --op int8_gemm --out-dir autotune_results_r4e \
  --max-candidates 14 --iters 16 --min-chain 0.25 --shapes \
  4096 4096 4096   64 7168 16384   128 4096 7168  1024 4096 7168 \
  2048 7168 16384  8192 4096 7168

echo "=== r4e queue done ==="
