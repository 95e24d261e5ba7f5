#!/bin/bash
# Retry TPU measurements across tunnel flaps; each phase runs until it
# succeeds once, then moves on.  Progress in benches/tpu_capture.log.
# Phases map to benches/kernel_profile.py sections; 'shard' captures the
# msm20_shard_d{1,2,4,8} inputs for the measured scaling projection
# (benches/scaling_bench.py).
cd /root/repo
LOG=benches/tpu_capture.log
phase_done() { grep -q "^DONE $1$" "$LOG" 2>/dev/null; }
mark() { echo "DONE $1" >> "$LOG"; }
probe() {
  timeout 90 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.arange(8, dtype=jnp.int32) * 3
assert int(np.asarray(x)[4]) == 12
" >/dev/null 2>&1
}
run_phase() {  # $1 = phase name, $2 = timeout seconds
  if ! phase_done "$1"; then
    echo "$(date +%s) trying $1" >> "$LOG"
    if timeout "$2" python benches/kernel_profile.py "$1" >> "$LOG" 2>&1; then
      mark "$1"
    fi
    return 1
  fi
  return 0
}
while true; do
  if ! probe; then echo "$(date +%s) wedged" >> "$LOG"; sleep 120; continue; fi
  run_phase add 540 || continue
  run_phase scan 540 || continue
  run_phase msm 540 || continue
  run_phase shard 900 || continue
  run_phase phases 540 || continue
  run_phase fused 1800 || continue
  echo "$(date +%s) all phases done" >> "$LOG"
  break
done
