#!/usr/bin/env bash
# Rank-sharded autotune sweep launcher.
#
# ≙ the reference's `multi_start.sh benchmark.py 8` multi-process launcher
# (referenced in `deep_gemm_ascend/doc/dev.md:47` but not committed there):
# launches WORLD independent sweep workers, each taking every WORLD-th
# tiling candidate (`--rank/--world` slicing, ≙ `benchmark.py:249-253`).
# On a single-chip host the workers time-share the chip — still useful for
# crash isolation (a poisoned config kills one worker, the others continue,
# and resume skips it). On a multi-host pod, run one invocation per host
# with RANK_BASE set to host_index * WORLD.
#
# Usage: scripts/multi_start.sh [WORLD] [extra autotune_sweep.py args...]
set -euo pipefail

WORLD="${1:-2}"
shift || true
RANK_BASE="${RANK_BASE:-0}"
OUT_DIR="${OUT_DIR:-autotune_results}"
cd "$(dirname "$0")/.."

pids=()
for ((r = 0; r < WORLD; r++)); do
  rank=$((RANK_BASE + r))
  python scripts/autotune_sweep.py \
    --rank "$rank" --world "$WORLD" --out-dir "$OUT_DIR" "$@" \
    > "$OUT_DIR/worker_${rank}.log" 2>&1 &
  pids+=("$!")
  echo "[multi_start] worker rank=$rank pid=${pids[-1]}"
done

fail=0
for pid in "${pids[@]}"; do
  wait "$pid" || fail=1
done
exit "$fail"
