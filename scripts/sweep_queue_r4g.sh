#!/bin/bash
# Round-4 sixth sweep pass: W8A8 int8 masked grouped GEMM — the MoE-decode
# hot path of the int8 expert option (models/moe.Int8ExpertWeights). Shapes
# mirror the EXISTING fp8 masked sweep geometries (32x96/384 — V2_LITE
# decode at batch 64, ep 1/4) so the tables compare the two quant recipes
# per shape, plus the E=64 V2_LITE_FULL pair and small-decode twins in the
# XLA-candidate gate region.
set -u
cd "$(dirname "$0")/.."
export DGA_KERNEL_CACHE_DIR="${DGA_KERNEL_CACHE_DIR:-/root/repo/.xla_cache}"
OUT=autotune_results_r4g
PY="bash scripts/py_retry.sh"

echo "=== [1/2] int8 masked at the fp8-swept V2_LITE geometries ==="
$PY scripts/autotune_sweep.py --op int8_grouped_gemm_masked --out-dir $OUT \
  --max-candidates 14 --iters 16 --min-chain 0.25 --shapes \
  32 96 2816 2048   32 96 2048 1408 \
  32 384 2816 2048  32 384 2048 1408

echo "=== [2/2] V2_LITE_FULL (E=64) + small-decode twins ==="
$PY scripts/autotune_sweep.py --op int8_grouped_gemm_masked --out-dir $OUT \
  --max-candidates 14 --iters 16 --min-chain 0.25 --shapes \
  64 384 2816 2048  64 384 2048 1408 \
  8 128 2048 1408   8 128 1408 2048

echo "=== r4g queue done ==="
