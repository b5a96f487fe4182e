#!/bin/bash
# Round-3 self-healing chip watcher: wait for the TPU tunnel to return,
# then run the remaining on-chip round-3 work end-to-end:
#   r4 queue (resumes from checkpoints) -> r4b queue -> straggler probe +
#   full-size layer bench (post_sweep_r4.sh) -> harvest (publish tilings,
#   retrain predictors, recalibrate cost model, regen BENCHMARKS.md).
# Run detached (setsid) so it survives the driving session. Writes
# watch_r3_state to report progress; touches watch_r3.done at the end.
set -u
cd /root/repo
STATE=watch_r3_state
echo "$(date -u +%H:%M:%S) waiting-for-tpu" > $STATE
probe() {
  timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1
}
until probe; do sleep 120; done
echo "$(date -u +%H:%M:%S) tpu-back; r4 queue" >> $STATE
bash scripts/sweep_queue_r4.sh >> autotune_results_r4_queue.log 2>&1
echo "$(date -u +%H:%M:%S) r4 done; r4b queue" >> $STATE
bash scripts/sweep_queue_r4b.sh >> autotune_results_r4b_queue.log 2>&1
echo "$(date -u +%H:%M:%S) r4b done; post-sweep (straggler+layer)" >> $STATE
bash scripts/post_sweep_r4.sh >> post_sweep_r4.log 2>&1
echo "$(date -u +%H:%M:%S) post-sweep done; harvest" >> $STATE
bash scripts/harvest_r4.sh > harvest_r4.log 2>&1
echo "$(date -u +%H:%M:%S) all done" >> $STATE
touch watch_r3.done
