#!/bin/bash
# Log tunnel health every 2 minutes to benches/tunnel_health.log
while true; do
  out=$(timeout 90 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.arange(8, dtype=jnp.int32) * 3
print('OK', int(np.asarray(x)[4]))
" 2>/dev/null | grep OK)
  echo "$(date +%s) ${out:-WEDGED}" >> "$(dirname "$0")/tunnel_health.log"
  sleep 120
done
