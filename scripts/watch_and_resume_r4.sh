#!/bin/bash
# Round-4 chip watcher — VERDICT r3 "Next round" item 1 ordering: the
# moment the tunnel returns, convert the already-written instruments into
# NUMBERS first (cheap, minutes each), then spend remaining chip time on
# the long sweep queues, harvesting incrementally between stages so a
# mid-chain outage still leaves published tables.
#
# Resilience: every stage runs under `timeout` (a dead tunnel HANGS jax
# calls rather than erroring — observed), and the tunnel is re-probed
# before each stage; if it is down, the watcher waits for it to return
# before continuing the chain. Run detached (setsid). Progress ->
# watch_r4_state; touches watch_r4.done at the end.
set -u
cd /root/repo
STATE=watch_r4_state
echo "$(date -u +%H:%M:%S) waiting-for-tpu" > $STATE

probe() {
  # nice -n 19: the probe's jax import burns ~15s of CPU; it must never
  # contend with a foreground test/bench run (e.g. the judge's pytest).
  nice -n 19 timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1
}

wait_for_tpu() {
  until probe; do sleep 300; done
}

stage_cpu() {  # stage_cpu <name> <timeout_s> <cmd...> — no tunnel needed
  local name=$1 tmo=$2; shift 2
  echo "$(date -u +%H:%M:%S) start: $name" >> $STATE
  timeout "$tmo" "$@"
  local rc=$?
  echo "$(date -u +%H:%M:%S) done: $name (rc=$rc)" >> $STATE
}

stage() {  # stage <name> <timeout_s> <cmd...> — waits for the tunnel
  wait_for_tpu
  stage_cpu "$@"
}

wait_for_tpu
echo "$(date -u +%H:%M:%S) tpu-back" >> $STATE

stage bench 2400 bash -c 'python bench.py > bench_r4_early.json 2> bench_r4_early.log'
stage instruments 9000 bash -c 'bash scripts/post_sweep_r4.sh >> post_sweep_r4.log 2>&1'
# Straggler-targeted resumes (cheap: config-keyed resume only measures the
# NEW ec/XLA candidates) — early so the named sub-85% rows get their fix
# candidates measured even if a later stage loses the tunnel.
stage sweep-r4f 7200 bash -c 'bash scripts/sweep_queue_r4f.sh >> autotune_results_r4f_queue.log 2>&1'
stage serve-chunksweep 2400 bash -c 'python scripts/serve_bench.py --mode chunksweep > serve_chunksweep_r4.log 2>&1'
stage serve-mixed 2400 bash -c 'python scripts/serve_bench.py --mode mixed > serve_mixed_r4.log 2>&1'
stage serve-prefix 2400 bash -c 'python scripts/serve_bench.py --mode prefix --max-seq 1024 > serve_prefix_r4.log 2>&1'
# Land whatever instrument numbers exist in docs/BENCHMARKS.md (idempotent
# marker-block rewrite) so a later tunnel loss can't orphan them in logs.
stage_cpu instruments-md 600 bash -c 'python scripts/instruments_to_md.py >> instruments_md.log 2>&1'
# Real-Mosaic validation of the round-4 dp-sharded prefill program.
stage aot-check 2400 bash -c 'python scripts/aot_multichip_check.py --topology v5e:2x4 --model v2_lite --batch 64 --max-seq 2048 --out docs/aot > aot_check_r4.log 2>&1'
stage sweep-r4 14400 bash -c 'bash scripts/sweep_queue_r4.sh >> autotune_results_r4_queue.log 2>&1'
stage sweep-r4b 14400 bash -c 'bash scripts/sweep_queue_r4b.sh >> autotune_results_r4b_queue.log 2>&1'
stage_cpu harvest-1 2400 bash -c 'bash scripts/harvest_r4.sh > harvest_r4_stage1.log 2>&1'
stage sweep-r4c 14400 bash -c 'bash scripts/sweep_queue_r4c.sh >> autotune_results_r4c_queue.log 2>&1'
stage sweep-r4d 14400 bash -c 'bash scripts/sweep_queue_r4d.sh >> autotune_results_r4d_queue.log 2>&1'
stage_cpu harvest-2 2400 bash -c 'bash scripts/harvest_r4.sh > harvest_r4_stage2.log 2>&1'
stage sweep-r4e 14400 bash -c 'bash scripts/sweep_queue_r4e.sh >> autotune_results_r4e_queue.log 2>&1'
stage sweep-r4g 7200 bash -c 'bash scripts/sweep_queue_r4g.sh >> autotune_results_r4g_queue.log 2>&1'
stage_cpu harvest-final 2400 bash -c 'bash scripts/harvest_r4.sh > harvest_r4.log 2>&1'
stage_cpu instruments-md-final 600 bash -c 'python scripts/instruments_to_md.py >> instruments_md.log 2>&1'
echo "$(date -u +%H:%M:%S) all done" >> $STATE
touch watch_r4.done
