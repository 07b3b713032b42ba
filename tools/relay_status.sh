#!/bin/bash
# Log-only relay watcher: append one line per probe to $1 (default
# /tmp/relay_status.log) so a foreground session can poll cheaply.
log="${1:-/tmp/relay_status.log}"
while true; do
  if timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; \
np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8, 8))))" >/dev/null 2>&1; then
    echo "up $(date +%s)" >> "$log"
  else
    echo "down $(date +%s)" >> "$log"
  fi
  sleep 90
done
