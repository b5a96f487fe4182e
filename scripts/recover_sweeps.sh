#!/bin/bash
# Self-healing: wait for the TPU tunnel to come back, then restart the
# round-3 sweep pipeline (r4 resumes from checkpoints; r4b from scratch).
set -u
cd /root/repo
probe() {
  timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1
}
until probe; do sleep 120; done
echo "$(date) TPU back"
# Kill the wedged r4b sweep (exact PIDs, cmdline-verified).
for pid in 7917 7919; do
  if grep -q "sweep_queue_r4b\|autotune_sweep" /proc/$pid/cmdline 2>/dev/null; then
    kill "$pid" 2>/dev/null
  fi
done
sleep 5
bash scripts/sweep_queue_r4.sh >> autotune_results_r4_queue.log 2>&1
bash scripts/sweep_queue_r4b.sh > autotune_results_r4b_queue.log 2>&1
