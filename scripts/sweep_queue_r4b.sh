#!/bin/bash
# Round-3 second sweep pass (VERDICT r2 item 3): grouped GEMM depth.
#  [1] NT layout for both grouped kernels on the DeepSeek-V2-Lite MoE
#      geometry (DeepGEMM's native K-major expert weights).
#  [2] Uneven tokens/expert contiguous rows (BASELINE.md variable
#      distribution; layout block 128).
#  [3] 8 new contiguous (M,N,K) points incl. V3-style 7168/2048 pairs.
#  [4] New masked points at E=16 (V3-ish) + small-M decode tails.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
OUT=autotune_results_r4b
PY="bash scripts/py_retry.sh"

echo "=== [1/4] grouped NT (contiguous + masked), V2-Lite geometry ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_contiguous_nt --out-dir $OUT \
  --max-candidates 20 --iters 16 --min-chain 0.25 --shapes \
  8 512 1408 2048  8 512 2048 1408
$PY scripts/autotune_sweep.py --op grouped_gemm_masked_nt --out-dir $OUT \
  --max-candidates 20 --iters 16 --min-chain 0.25 --shapes \
  8 128 1408 2048  8 128 2048 1408

echo "=== [2/4] uneven tokens/expert contiguous ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_contiguous --uneven \
  --out-dir $OUT --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  8 512 1408 2048  8 512 2048 1408  8 128 1408 2048  8 128 2048 1408

echo "=== [3/4] new contiguous (M,N,K) points ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_contiguous --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  8 64 1408 2048   8 64 2048 1408 \
  8 256 1408 2048  8 256 2048 1408 \
  8 1024 1408 2048 8 1024 2048 1408 \
  16 128 2048 7168 16 128 7168 2048

echo "=== [4/4] new masked points ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_masked --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  16 64 2048 7168  16 64 7168 2048  8 64 1408 2048  8 64 2048 1408

echo "=== r4b queue done ==="
