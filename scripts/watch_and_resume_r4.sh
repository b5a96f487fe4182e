#!/bin/bash
# Round-4 chip watcher — VERDICT r3 "Next round" item 1 ordering: the
# moment the tunnel returns, convert the already-written instruments into
# NUMBERS first (cheap, minutes each), then spend remaining chip time on
# the long sweep queues, then harvest.
#   1. bench.py            — re-establish the driver-verifiable headline
#   2. post_sweep_r4.sh    — straggler probe + full-size layer bench
#   3. serve_bench.py      — chunksweep + mixed prefill/decode throughput
#   4. sweep_queue_r4.sh   — fp8 NT 32-shape completion (config-keyed resume)
#   5. sweep_queue_r4b.sh  — grouped NT / uneven / new points
#   6. sweep_queue_r4c.sh  — dense nt/tn/tt layouts + off-prefix exploration
#   7. harvest_r4.sh       — publish tilings, retrain predictors, recalibrate
# Run detached (setsid). Progress -> watch_r4_state; touch watch_r4.done.
set -u
cd /root/repo
STATE=watch_r4_state
echo "$(date -u +%H:%M:%S) waiting-for-tpu" > $STATE
probe() {
  timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1
}
until probe; do sleep 120; done
echo "$(date -u +%H:%M:%S) tpu-back; bench" >> $STATE
python bench.py > bench_r4_early.json 2> bench_r4_early.log
echo "$(date -u +%H:%M:%S) bench done ($(cat bench_r4_early.json)); instruments" >> $STATE
bash scripts/post_sweep_r4.sh >> post_sweep_r4.log 2>&1
echo "$(date -u +%H:%M:%S) straggler+layer done; serving benches" >> $STATE
python scripts/serve_bench.py --mode chunksweep > serve_chunksweep_r4.log 2>&1
python scripts/serve_bench.py --mode mixed > serve_mixed_r4.log 2>&1
python scripts/serve_bench.py --mode prefix --max-seq 1024 > serve_prefix_r4.log 2>&1
echo "$(date -u +%H:%M:%S) serving benches done; aot check" >> $STATE
# Real-Mosaic validation of the round-4 dp-sharded prefill program (the
# CPU dryrun is interpret-mode; this catches lane/layout rejections).
python scripts/aot_multichip_check.py --topology v5e:2x4 --model v2_lite \
  --batch 64 --max-seq 2048 --out docs/aot > aot_check_r4.log 2>&1
echo "$(date -u +%H:%M:%S) aot check done; r4 queue" >> $STATE
# Harvest INCREMENTALLY after each sweep stage (publish/retrain/report
# are idempotent, CPU-only, ~minutes): if the round ends mid-queue, the
# tables and packaged tilings still reflect everything measured so far.
bash scripts/sweep_queue_r4.sh >> autotune_results_r4_queue.log 2>&1
echo "$(date -u +%H:%M:%S) r4 done; r4b queue" >> $STATE
bash scripts/sweep_queue_r4b.sh >> autotune_results_r4b_queue.log 2>&1
echo "$(date -u +%H:%M:%S) r4b done; harvest-1" >> $STATE
bash scripts/harvest_r4.sh > harvest_r4_stage1.log 2>&1
echo "$(date -u +%H:%M:%S) harvest-1 done; r4c queue" >> $STATE
bash scripts/sweep_queue_r4c.sh >> autotune_results_r4c_queue.log 2>&1
echo "$(date -u +%H:%M:%S) r4c done; r4d queue" >> $STATE
bash scripts/sweep_queue_r4d.sh >> autotune_results_r4d_queue.log 2>&1
echo "$(date -u +%H:%M:%S) r4d done; harvest-2" >> $STATE
bash scripts/harvest_r4.sh > harvest_r4_stage2.log 2>&1
echo "$(date -u +%H:%M:%S) harvest-2 done; r4e queue" >> $STATE
bash scripts/sweep_queue_r4e.sh >> autotune_results_r4e_queue.log 2>&1
echo "$(date -u +%H:%M:%S) r4e done; final harvest" >> $STATE
bash scripts/harvest_r4.sh > harvest_r4.log 2>&1
echo "$(date -u +%H:%M:%S) all done" >> $STATE
touch watch_r4.done
