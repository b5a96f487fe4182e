#!/bin/bash
# Round-3 first sweep pass: bring fp8_gemm_nt to the FULL 32-shape
# dynamic-M suite (VERDICT r2 "Next round" item 3 — 10 of 32 swept so
# far). Shapes below are exactly the dynamic suite minus the rows already
# in autotune_results_r3/r3c.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
OUT=autotune_results_r4
PY="bash scripts/py_retry.sh"

echo "=== [1/1] fp8 NT dynamic-M completion (22 shapes) ==="
$PY scripts/autotune_sweep.py --op fp8_gemm_nt --out-dir $OUT \
  --max-candidates 14 --iters 16 --min-chain 0.25 --shapes \
  256 4096 7168   1024 4096 7168  4096 4096 7168  8192 4096 7168 \
  256 7168 18432  1024 7168 18432 2048 7168 18432 4096 7168 18432 8192 7168 18432 \
  256 18432 7168  512 18432 7168  1024 18432 7168 4096 18432 7168 8192 18432 7168 \
  64 7168 16384   128 7168 16384  256 7168 16384  512 7168 16384 \
  1024 7168 16384 2048 7168 16384 4096 7168 16384 8192 7168 16384

echo "=== r4 queue done ==="
