#!/bin/bash
# Wait for the axon relay to come back, then run the workflow benches.
# Detached helper for sessions where the relay is down; logs to $1.
log="${1:-/tmp/relay_watch.log}"
cd /root/repo
echo "relay_watch start $(date +%T)" >> "$log"
while true; do
  if timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; \
np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8, 8))))" >/dev/null 2>&1; then
    echo "relay up $(date +%T)" >> "$log"
    break
  fi
  echo "relay still down $(date +%T)" >> "$log"
  sleep 120
done
timeout 3000 python bench_suite.py --repeat 3 --only hls_workflow,leak_trace \
  >> "$log" 2>&1
echo "bench done $(date +%T) rc=$?" >> "$log"
