#!/bin/bash
# Chip-work chain after the r4b sweep: straggler probe (VERDICT r2 item
# 4 decomposition) then full-size layer bench (item 8).
set -u
cd "$(dirname "$0")/.."
python scripts/straggler_probe.py > straggler_probe_r3.log 2>&1
echo "=== straggler probe done ==="
python scripts/layer_bench.py > layer_bench_r3.log 2>&1
echo "=== layer bench done ==="
python scripts/layer_bench.py --expert-quant int8 > layer_bench_int8_r4.log 2>&1
echo "=== int8 layer bench done ==="
python scripts/eval_quality.py --model v2_lite --expert-quant int8 \
    > eval_int8_v2lite_r4.log 2>&1
echo "=== int8 v2_lite fidelity eval done ==="
python scripts/serve_bench.py --mode scan --model v2_lite \
    --expert-quant int8 --max-seq 2048 > serve_scan_int8_r4.log 2>&1
echo "=== int8 v2_lite decode bench done ==="
python scripts/serve_bench.py --mode engine --model v2_lite \
    --speculative-k 4 > serve_spec_r4.log 2>&1
echo "=== speculative-decode engine bench done ==="
