#!/bin/bash
# Round-2 on-chip autotune queue — runs the sweeps VERDICT r1 asked for,
# serially (one chip, one timing process at a time), highest leverage first:
#  1. deep mid-M fp8 sweep (full-K/half-K candidates now in the space)
#  2. grouped contiguous (BASELINE config 3 — was never swept)
#  3. NT-layout fp8 (headline + skinny M)
#  4. split-K on-chip evidence (long-K, small-MN shapes)
#  5. bf16 reference-suite completion (the 12 unswept shapes)
# Resumable: each sweep keeps jsonl + ckpt under $OUT.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
OUT=autotune_results_r3
PY=python

echo "=== [1/5] fp8 mid-M deep sweep ==="
$PY scripts/autotune_sweep.py --op fp8_gemm --out-dir $OUT \
  --max-candidates 24 --iters 16 --min-chain 0.25 --shapes \
  128 4096 7168  128 7168 18432  128 18432 7168 \
  256 7168 18432  256 18432 7168 \
  512 4096 7168  512 7168 18432 \
  1024 4096 7168  1024 18432 7168 \
  2048 4096 7168  2048 7168 18432  2048 18432 7168 \
  4096 4096 4096

echo "=== [2/5] grouped contiguous (MoE prefill) ==="
$PY scripts/autotune_sweep.py --op grouped_gemm_contiguous --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  8 512 1408 2048  8 512 2048 1408  32 256 1408 2048  32 256 2048 1408

echo "=== [3/5] fp8 NT layout ==="
$PY scripts/autotune_sweep.py --op fp8_gemm_nt --out-dir $OUT \
  --max-candidates 16 --iters 16 --min-chain 0.25 --shapes \
  4096 4096 4096  64 4096 7168  128 4096 7168

echo "=== [4/5] split-K evidence ==="
$PY scripts/autotune_sweep.py --op gemm --inject-ksplit --out-dir $OUT \
  --iters 16 --min-chain 0.25 --shapes \
  64 512 16384  8 7168 18432  64 7168 16384

echo "=== [5/5] bf16 reference-suite completion ==="
$PY scripts/autotune_sweep.py --op gemm --out-dir $OUT \
  --max-candidates 12 --iters 16 --min-chain 0.25 --shapes \
  4096 4096 4096  8 7168 18432  8 18432 7168 \
  64 4096 7168  64 18432 7168  64 24576 1536  64 32768 512 \
  128 4096 7168  128 7168 18432  1024 18432 7168 \
  1279 5003 7681  3511 6151 8191

echo "=== [6/6] fp8 large-M + primes (best effort) ==="
$PY scripts/autotune_sweep.py --op fp8_gemm --out-dir $OUT \
  --max-candidates 18 --iters 16 --min-chain 0.25 --shapes \
  8192 4096 7168  8192 7168 18432  8192 18432 7168 \
  3511 6151 8191  5119 6997 9901  1024 7168 18432  256 4096 7168

echo "=== queue done ==="
