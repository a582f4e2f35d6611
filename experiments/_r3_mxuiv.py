"""R3: layer-major interleave A/B for the plain (mxu) stage kernel.

The pass-major plain kernel measures 19.5% MFU at nf128-d2 — chain-
latency-bound (d3 adds 1.46x FLOPs for ~free).  _plain_iv_kernel runs
layer d of all 12 passes back-to-back (independent matmuls, 3 MB of
live activations).  Dense-arch interleave lost 15% in-context to VMEM
pressure (PERF.md); plain is 2.5x narrower.

Usage: _r3_mxuiv.py [--cpu]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import mulut_tpu.ops.unit_kernel as uk
from mulut_tpu.models.srnet import (
    init_srnets,
    srnets_predict_fast,
    stack_srnets_for_fast,
)
from mulut_tpu.utils.profiling import device_time

CPU = "--cpu" in sys.argv
scale, stages, modes = 4, 2, "sdy"
H, W, B = (6, 7, 1) if CPU else (270, 480, 8)
PEAK = 197e12
out_px = B * 3 * H * W * scale * scale

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float32))

for nf, depth in ((128, 2), (128, 3)):
    params = init_srnets(jax.random.PRNGKey(0), nf=nf, scale=scale,
                         modes=modes, stages=stages, arch="mxu", depth=depth)
    stacked = stack_srnets_for_fast(params, modes=modes, stages=stages,
                                    scale=scale)
    macs = sum(
        12 * (4 * nf + depth * nf * nf
              + nf * (scale * scale if s + 1 == stages else 1))
        for s in range(stages))
    base = None
    for iv in (False, True):
        uk.PLAIN_INTERLEAVE = iv
        uk.stage_ensemble_apply.clear_cache()
        run = jax.jit(lambda xx, st=stacked: srnets_predict_fast(
            st, xx, modes=modes, stages=stages, scale=scale, interpret=CPU))
        label = f"mxu-nf{nf}-d{depth}-{'iv' if iv else 'pm'}"
        t0 = time.perf_counter()
        out = np.asarray(run(x))
        print(f"[{label}] compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        if base is None:
            base = out
        else:
            print(f"[{label}] parity:",
                  "MATCH" if np.array_equal(out, base) else "MISMATCH",
                  flush=True)
        if CPU:
            continue
        dt = device_time(lambda: run(x), n=3)
        flops = 2 * macs * B * 3 * H * W
        print(f"[{label}] {dt * 1e3:.1f} ms/batch  "
              f"{out_px / dt / 1e6:.1f} MPix/s out  "
              f"MFU {flops / dt / PEAK * 100:.1f}%", flush=True)
uk.PLAIN_INTERLEAVE = False
