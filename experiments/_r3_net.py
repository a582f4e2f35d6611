"""R3 scratch: net-mode (Pallas stage-ensemble) MFU experiments.

Sweeps ENSEMBLE_TILE and traces the per-op breakdown of the fast path at
the bench shape.  Usage: _r3_net.py [tile ...] [--trace]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.unit_kernel as uk
from mulut_tpu.models.blocks import init_mulut_unit
from mulut_tpu.models.srnet import (
    srnets_predict_fast,
    stack_srnets_for_fast,
)
from mulut_tpu.utils.profiling import device_time, op_breakdown

scale, stages, modes = 4, 2, "sdy"
H, W, B = 270, 480, 8
NF = 64

tiles = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1024, 2048, 4096]
do_trace = "--trace" in sys.argv

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
params = {}
for s in range(stages):
    up = scale if s + 1 == stages else 1
    for m in modes:
        key, k2 = jax.random.split(key)
        params[f"s{s + 1}_{m}"] = init_mulut_unit(
            k2, nf=NF, upscale=up, dense=True
        )

x = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float32))
flop_per_inpix = 2 * 46336 * 12 * stages  # 2*MACs, 12 mode-rot, 2 stages
PEAK = 197e12

for tile in tiles:
    uk.ENSEMBLE_TILE = tile
    stacked = stack_srnets_for_fast(
        params, modes=modes, stages=stages, scale=scale
    )
    run = jax.jit(lambda st, xx: srnets_predict_fast(
        st, xx, modes=modes, stages=stages, scale=scale))
    t0 = time.perf_counter()
    np.asarray(run(stacked, x)[:1, :1, 0, :4])
    print(f"[tile={tile}] compile {time.perf_counter()-t0:.0f}s", flush=True)
    dt = device_time(lambda: run(stacked, x), n=3)
    inpix = B * 3 * H * W
    tput = inpix * 16 / 1e6 / dt
    mfu = inpix * flop_per_inpix / dt / PEAK
    print(f"[tile={tile}] {dt*1e3:.1f} ms/batch = {tput:.1f} MPix/s out, "
          f"MFU {mfu*100:.1f}%", flush=True)

    if do_trace and tile == tiles[-1]:
        TRACE = "/tmp/r3_net_trace"
        jax.profiler.start_trace(TRACE)
        for _ in range(3):
            out = run(stacked, x)
        np.asarray(out[:1, :1, 0, :4])
        jax.profiler.stop_trace()
        rows = op_breakdown(TRACE, top=25)
        tot = sum(ms for ms, _, _ in rows)
        print(f"total traced {tot:.1f} ms over 3 -> {tot/3:.1f} ms/run")
        for ms, name, long_name in rows:
            print(f"{ms/3:8.2f} ms  {name}  | {long_name[:130]}")
