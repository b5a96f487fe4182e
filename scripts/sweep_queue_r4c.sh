#!/bin/bash
# Round-3 third sweep pass (optional, time-permitting):
#  [1] Dense bf16 NT/TN/TT layout sweeps — per-layout tiling records and
#      calibration entries (≙ the reference's four per-layout tiling
#      policies, do_tiling.h:24-26 / do_tiling.cpp:20-204). Operands are
#      generated in the stored layout (autotune_sweep dense branch).
#  [2] fp8_gemm_nt exploration top-up: resume the r4 sweeps with
#      --explore-extra so the learned tier sees off-prefix candidates
#      (prefix-only records teach the MLP nothing the analytic sort
#      didn't already know — the r3 holdout weakness).
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
PY="bash scripts/py_retry.sh"

echo "=== [1/2] dense bf16 layout sweeps (nt/tn/tt) ==="
for op in gemm_nt gemm_tn gemm_tt; do
  $PY scripts/autotune_sweep.py --op "$op" --out-dir autotune_results_r4c \
    --max-candidates 12 --iters 16 --min-chain 0.25 --shapes \
    4096 4096 4096   128 4096 7168   2048 7168 16384   64 7168 18432
done

echo "=== [2/3] fp8_gemm_nt off-prefix exploration (resume r4 dir) ==="
$PY scripts/autotune_sweep.py --op fp8_gemm_nt --out-dir autotune_results_r4 \
  --max-candidates 14 --explore-extra 6 --iters 16 --min-chain 0.25 --shapes \
  64 7168 16384   128 7168 16384  512 7168 16384  2048 7168 16384 \
  256 4096 7168   1024 4096 7168  256 7168 18432  1024 18432 7168

echo "=== [3/3] bf16 gemm off-prefix exploration (fresh dir; the packaged"
echo "    gemm predictor's held-out record collapsed to 2.86 after the"
echo "    corrupt-record scrub — these records repair its training set) ==="
$PY scripts/autotune_sweep.py --op gemm --out-dir autotune_results_r4c \
  --max-candidates 12 --explore-extra 6 --iters 16 --min-chain 0.25 --shapes \
  4096 4096 4096  64 24576 1536  1279 5003 7681  2048 4096 7168

echo "=== r4c queue done ==="
