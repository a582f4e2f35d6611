#!/bin/bash
# Detached chip-revival runner (round 3, session 8).
#
# The axon TPU tunnel dies in two modes (NOTES_ROUND3.md): devices()
# hangs, or dispatch works but any D2H readback hangs.  This script
# probes the FULL path (devices + dispatch + readback) every 10 min;
# when it passes, it drains the queued chip experiments once, then
# keeps probing (a later session can re-arm QUEUE via the flag file).
#
# Usage:  nohup bash experiments/chip_runner.sh > /tmp/chip_runner.log 2>&1 &
# Flags:  /tmp/TUNNEL_UP          touched when a probe passes
#         /tmp/CHIP_QUEUE_DONE    touched after the queue drains
# Logs:   /tmp/chip_q/<name>.log  one per experiment
set -u
PY=/opt/venv/bin/python
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
mkdir -p /tmp/chip_q

probe() {
  timeout 180 $PY - <<'EOF' > /tmp/chip_q/probe_last.log 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
y = (x @ x).block_until_ready()
v = np.asarray(y)          # the D2H leg is the one that hangs
assert float(v[0, 0]) == 256.0
print("D2H OK", jax.devices())
EOF
}

run_one() {  # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  echo "[$(date +%H:%M:%S)] RUN $name (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "/tmp/chip_q/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] DONE $name rc=$?"
}

while true; do
  if probe; then
    touch /tmp/TUNNEL_UP
    echo "[$(date +%H:%M:%S)] tunnel UP"
    if [ ! -f /tmp/CHIP_QUEUE_DONE ]; then
      run_one 01_i8    1200 $PY experiments/_r3_i8.py
      run_one 02_rs    3600 $PY experiments/_r3_rs.py
      run_one 03_q     3600 $PY experiments/_r3_q.py
      run_one 04_bench 1800 $PY bench.py
      touch /tmp/CHIP_QUEUE_DONE
      echo "[$(date +%H:%M:%S)] queue drained"
    fi
  else
    rm -f /tmp/TUNNEL_UP
    echo "[$(date +%H:%M:%S)] tunnel down (probe rc=$?)"
  fi
  sleep 600
done
