#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run the remaining
# round-3 lanes serially (D: bench table + seed-variance evals, then S:
# the speculative cont_pce_8191 push). Probe failures are cheap while the
# relay is down (connection refused -> fast UNAVAILABLE); once the relay
# returns the first successful matmul gates the launch.
cd /root/repo
echo "[gate] $(date) waiting for TPU" >> /tmp/tpu_gate.log
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float((x @ x).sum()))
" >> /tmp/tpu_gate.log 2>&1; then
    echo "[gate] $(date) TPU is back" >> /tmp/tpu_gate.log
    break
  fi
  sleep 240
done
sleep 10
python scripts/runq.py D >> /tmp/tpu_gate.log 2>&1
python scripts/runq.py T >> /tmp/tpu_gate.log 2>&1
python scripts/runq.py S >> /tmp/tpu_gate.log 2>&1
echo "[gate] $(date) lanes D+T+S complete" >> /tmp/tpu_gate.log
