#!/bin/bash
# r5 revival runner v2: tighter probes, quality-first queue (time-boxed
# for the tail of the round).  See chip_runner_r5.sh for background.
set -u
PY=/opt/venv/bin/python
export PYTHONPATH=/root/repo
cd /root/repo
mkdir -p /tmp/chip_q5

probe() {
  timeout 120 $PY - <<'PYEOF' > /tmp/chip_q5/probe_last.log 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
y = (x @ x).block_until_ready()
v = np.asarray(y)
assert float(v[0, 0]) == 256.0
print("D2H OK", jax.devices())
PYEOF
}

run_one() {
  local name=$1 tmo=$2; shift 2
  echo "[$(date +%H:%M:%S)] RUN $name (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "/tmp/chip_q5/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] DONE $name rc=$?"
}

for i in $(seq 1 90); do
  if probe; then
    touch /tmp/TUNNEL_UP_R5
    echo "[$(date +%H:%M:%S)] tunnel UP"
    run_one 01_trace 700  $PY -u experiments/_r5_trace.py --skip-parity
    run_one 02_distill 5400 $PY -u experiments/_r5_distill.py
    run_one 03_dense 1500 $PY -u experiments/_r5_dense_t.py --tiles 1024 2048
    run_one 04_bench 1200 $PY bench.py
    touch /tmp/CHIP_R5_DONE
    echo "[$(date +%H:%M:%S)] queue drained"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] tunnel down (probe $i)"
  sleep 120
done
