#!/bin/bash
# Retry TPU measurements across tunnel flaps; each phase runs until it
# succeeds once, then moves on.  Progress in benches/tpu_capture.log.
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
while true; do
  if ! probe; then echo "$(date +%s) wedged" >> "$LOG"; sleep 120; continue; fi
  if ! phase_done msm; then
    echo "$(date +%s) trying msm" >> "$LOG"
    if timeout 540 python benches/kernel_profile.py msm >> "$LOG" 2>&1; then mark msm; fi
    continue
  fi
  if ! phase_done fused; then
    echo "$(date +%s) trying fused" >> "$LOG"
    if timeout 560 python benches/kernel_profile.py fused >> "$LOG" 2>&1; then mark fused; fi
    continue
  fi
  echo "$(date +%s) all phases done" >> "$LOG"
  break
done
