#!/bin/bash
# Probe the tunneled TPU every 5 min; append status to $LOG (default
# /tmp/tpu_watch.log). Stop by touching ${LOG%.log}.stop. A probe does a
# real varied-input matmul (the tunnel dedups identical dispatches) with a
# 120s timeout: a hard-down tunnel HANGS backend init rather than raising.
LOG=${LOG:-/tmp/tpu_watch.log}
STOP=${LOG%.log}.stop
while [ ! -f "$STOP" ]; do
  ts=$(date +%H:%M:%S)
  if out=$(cd /tmp && timeout 120 python -c "
import jax, time, random
import jax.numpy as jnp
d = jax.devices()
x = jnp.ones((1024,1024), jnp.bfloat16) * (1 + random.random()*1e-6)
t = time.time(); y = (x @ x); s = float(y.sum())
print(f'UP probe={time.time()-t:.2f}s dev={d[0]}')
" 2>/dev/null | grep '^UP'); then
    echo "$ts $out" >> "$LOG"
  else
    echo "$ts DOWN" >> "$LOG"
  fi
  sleep 300
done
