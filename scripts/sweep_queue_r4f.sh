#!/bin/bash
# Round-4 straggler-targeted resumes (VERDICT r3 item 4): re-open the
# ORIGINAL sweep files for the named sub-85% rows so candidates added
# since those sweeps ran — expert_coalesce grid-fusion variants for the
# masked op and the XLA kernel family for dispatch-floor-bound shapes —
# get measured under the same timing harness and packaged by the normal
# harvest path. Config-keyed resume (tiling/autotune.py) replays the
# existing prefix records, so only the NEW candidates burn chip time.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
PY="bash scripts/py_retry.sh"

echo "=== [1/3] masked 66.5% row + twin (resume r3c: ec + XLA) ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_masked \
  --out-dir autotune_results_r3c \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  8 128 2048 1408  8 128 1408 2048

echo "=== [2/3] bf16 4096^3 (84.9%, 22 configs tried) deep targeted ==="
echo "    sweep (resume r3; fp8 twin reaches 89.1% at this shape)   ==="
$PY scripts/autotune_sweep.py --op gemm --out-dir autotune_results_r3 \
  --max-candidates 30 --explore-extra 8 --iters 16 --min-chain 0.25 --shapes \
  4096 4096 4096

echo "=== [3/3] bf16 prime rows (77-80%) deeper candidates ==="
$PY scripts/autotune_sweep.py --op gemm --out-dir autotune_results_r3 \
  --max-candidates 20 --explore-extra 6 --iters 16 --min-chain 0.25 --shapes \
  1279 5003 7681  3511 6151 8191  5119 6997 9901

echo "=== r4f queue done ==="
