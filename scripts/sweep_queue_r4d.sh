#!/bin/bash
# Round-4 fourth sweep pass (VERDICT r3 item 5: grouped suite depth "in
# both layouts"): the r4b queue's 8 new contiguous (M,N,K) points and 4
# new masked points again in the NT layout (DeepGEMM's native K-major
# expert weights), so the grouped-NT tiling/predictor stack trains on the
# same DeepSeek-MoE geometry spread as the NN layout.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
OUT=autotune_results_r4d
PY="bash scripts/py_retry.sh"

echo "=== [1/2] contiguous NT at the r4b new-point spread ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_contiguous_nt --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  8 64 1408 2048   8 64 2048 1408 \
  8 256 1408 2048  8 256 2048 1408 \
  8 1024 1408 2048 8 1024 2048 1408 \
  16 128 2048 7168 16 128 7168 2048

echo "=== [2/2] masked NT at the r4b new masked points ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_masked_nt --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  16 64 2048 7168  16 64 7168 2048  8 64 1408 2048  8 64 2048 1408

echo "=== r4d queue done ==="
