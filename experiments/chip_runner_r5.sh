#!/bin/bash
# Detached chip-revival runner (round 5).
#
# Probes the FULL device path (dispatch + D2H) every 5 min; when it
# passes, drains the r5 chip queue once, then exits.  See
# chip_runner.sh (r3) for the failure-mode background.
#
# Usage:  nohup bash experiments/chip_runner_r5.sh > /tmp/chip_r5.log 2>&1 &
#         echo $! > /tmp/chip_r5.pid
# Flags:  /tmp/TUNNEL_UP_R5       touched when a probe passes
#         /tmp/CHIP_R5_DONE       touched after the queue drains
# Logs:   /tmp/chip_q5/<name>.log one per experiment
set -u
PY=/opt/venv/bin/python
export PYTHONPATH=/root/repo
cd /root/repo
mkdir -p /tmp/chip_q5

probe() {
  timeout 180 $PY - <<'EOF' > /tmp/chip_q5/probe_last.log 2>&1
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
  timeout "$tmo" "$@" > "/tmp/chip_q5/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] DONE $name rc=$?"
}

for i in $(seq 1 60); do
  if probe; then
    touch /tmp/TUNNEL_UP_R5
    echo "[$(date +%H:%M:%S)] tunnel UP"
    run_one 01_trace 900  $PY -u experiments/_r5_trace.py --skip-parity
    run_one 02_dense 1800 $PY -u experiments/_r5_dense_t.py --tiles 1024 2048
    run_one 03_distill 7200 $PY -u experiments/_r5_distill.py
    run_one 04_bench 1200 $PY bench.py
    touch /tmp/CHIP_R5_DONE
    echo "[$(date +%H:%M:%S)] queue drained"
    exit 0
  fi
  echo "[$(date +%H:%M:%S)] tunnel down (probe $i)"
  sleep 300
done
echo "[$(date +%H:%M:%S)] gave up after 60 probes"
