#!/bin/bash
# Chip-day instrument chain (watcher "instruments" stage): straggler probe
# (VERDICT r2 item 4 decomposition), full-size layer bench fp8 + W8A8
# (item 8), int8 model-fidelity eval, int8 decode bench, speculative-decode
# bench. Each command runs under its own timeout — a dead-tunnel hang in
# one instrument must not eat the whole stage's budget (the tunnel HANGS
# jax calls rather than erroring on this rig).
set -u
cd "$(dirname "$0")/.."
run() {  # run <timeout_s> <logfile> <cmd...>
  local tmo=$1 log=$2; shift 2
  timeout "$tmo" "$@" > "$log" 2>&1
  echo "=== $log done (rc=$?) ==="
}
run 1800 straggler_probe_r3.log    python scripts/straggler_probe.py
run 1500 layer_bench_r3.log        python scripts/layer_bench.py
run 1500 layer_bench_int8_r4.log   python scripts/layer_bench.py \
                                       --expert-quant int8
run 1500 eval_int8_v2lite_r4.log   python scripts/eval_quality.py \
                                       --model v2_lite --expert-quant int8
run 1200 serve_scan_int8_r4.log    python scripts/serve_bench.py \
                                       --mode scan --model v2_lite \
                                       --expert-quant int8 --max-seq 2048
run 1200 serve_spec_r4.log         python scripts/serve_bench.py \
                                       --mode engine --model v2_lite \
                                       --speculative-k 4
