#!/bin/bash
# Bounded-retry python wrapper for sweep queue scripts.
#
# The Autotuner hard-exits (code 17) when a candidate hangs past the
# DGA_CANDIDATE_TIMEOUT_S watchdog — the only way to release a wedged
# device queue (observed round 5: one stuck remote compile blocked every
# tunnel client for 18+ minutes). Config-keyed resume marks the hung
# candidate poisoned, so simply re-invoking continues the sweep where it
# left off. 5 attempts bounds a pathological queue segment to ~5 hung
# candidates' worth of wall clock.
set -u
for attempt in 1 2 3 4 5; do
  python "$@"
  rc=$?
  [ $rc -eq 0 ] && exit 0
  echo "[py_retry] attempt $attempt exited rc=$rc — resuming" >&2
done
echo "[py_retry] giving up after 5 attempts" >&2
exit $rc
