#!/bin/bash
# Round-2 third sweep pass: widen NT-layout coverage over the DeepSeek
# suite (only 3 NT shapes swept so far) and deepen the grouped rows that
# sit below 85% of light-speed in docs/BENCHMARKS.md.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
OUT=autotune_results_r3c
PY=python

echo "=== [1/2] fp8 NT DeepSeek suite ==="
$PY scripts/autotune_sweep.py --op fp8_gemm_nt --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  64 7168 18432  64 18432 7168 \
  128 7168 18432  128 18432 7168 \
  512 4096 7168  512 7168 18432 \
  2048 4096 7168  2048 18432 7168

echo "=== [2/2] grouped masked deepen ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_masked --out-dir $OUT \
  --max-candidates 24 --iters 16 --min-chain 0.25 --shapes \
  8 128 1408 2048  8 128 2048 1408  8 512 1408 2048  8 512 2048 1408

echo "=== r2c queue done ==="
