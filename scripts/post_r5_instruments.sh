#!/bin/bash
# Round-5 instrument chain (gated watcher stage: .instruments_r5_ready).
# Re-runs the instruments whose round-4 results were broken or missing:
#   - layer_bench: round-4 run died with HTTP 413 (weights were closed
#     over -> HLO constants -> remote-compile body limit); fixed to pass
#     params as arguments.
#   - eval_quality int8: round-4 gate conflated kernel fidelity with the
#     fp8->int8 re-quantization cost; now separated (quant_* metrics).
#   - straggler_probe: round-4 XLA-native-dot rows were measured before
#     the timing-chain optimization_barrier fix and reported absurd
#     5795% light-speed numbers; re-measure with the fixed harness.
set -u
cd "$(dirname "$0")/.."
run() {  # run <timeout_s> <logfile> <cmd...>
  local tmo=$1 log=$2; shift 2
  timeout "$tmo" "$@" > "$log" 2>&1
  echo "=== $log done (rc=$?) ==="
}
run 1500 layer_bench_r5.log        python scripts/layer_bench.py
run 1500 layer_bench_int8_r5.log   python scripts/layer_bench.py \
                                       --expert-quant int8
run 1500 eval_int8_v2lite_r5.log   python scripts/eval_quality.py \
                                       --model v2_lite --expert-quant int8
run 1800 straggler_probe_r5.log    python scripts/straggler_probe.py
# Fresh fp8 scan twin of the round-4 int8 scan (6436 tok/s): the fp8
# comparison point (2769) is a round-2 measurement that predates the
# flash-prefill block tuning — re-pair them on the same code.
run 1200 serve_scan_fp8_r5.log     python scripts/serve_bench.py \
                                       --mode scan --model v2_lite \
                                       --max-seq 2048
run 1200 serve_spec_r5.log         python scripts/serve_bench.py \
                                       --mode engine --model v2_lite \
                                       --speculative-k 4
run 1500 serve_spec_oracle_r5.log  python scripts/serve_bench.py \
                                       --mode engine --model v2_lite \
                                       --speculative-k 4 --spec-oracle
# serve-prefix retry: the direct watcher stage died on a transient
# remote-compile helper crash (HTTP 500) at 00:12 UTC.
run 1800 serve_prefix_r5.log       python scripts/serve_bench.py \
                                       --mode prefix --max-seq 1024
