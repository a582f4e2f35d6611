"""R3 scratch: MXU-shaped (plain-MLP) unit arch vs dense-concat, on chip.

PERF.md's unit accounting: the dense-concat pass (6 dependent matmuls,
K<=320/N=64, 9 MXU units for 46336 MACs) caps at 31% theoretical MFU,
16.5% measured.  The mxu arch (plain nf=128 MLP, depth hidden matmuls,
3-4 units/pass at full 128 lanes, half the chain length) caps at ~71%
(d2) / 78% (d3).  This measures the real in-context ladder at the bench
shape via srnets_predict_fast (device-only marginal timing).

Usage: _r3_mxu.py [--cpu]   (CPU = interpret-mode parity smoke only)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.models.srnet import (
    init_srnets,
    srnets_predict_fast,
    stack_srnets_for_fast,
)

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

from mulut_tpu.utils.profiling import device_time  # noqa: E402

scale, stages, modes = 4, 2, "sdy"
H, W, B = (6, 7, 1) if CPU else (270, 480, 8)  # interpret mode is slow
PEAK = 197e12
out_px = B * 3 * H * W * scale * scale

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float32))


def macs_per_inpix(arch, nf, depth):
    """Sum over stages of per-pixel ensemble MACs (12 mode-rot passes)."""
    total = 0
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        if arch == "dense":
            m = 4 * nf + 10 * nf * nf + 5 * nf * v
        else:
            m = 4 * nf + depth * nf * nf + nf * v
        total += 12 * m
    return total


CONFIGS = [
    ("dense-nf64", "dense", 64, 4),
    ("mxu-nf128-d2", "mxu", 128, 2),
    ("mxu-nf128-d3", "mxu", 128, 3),
    ("mxu-nf256-d2", "mxu", 256, 2),
]

for label, arch, nf, depth in CONFIGS:
    params = init_srnets(jax.random.PRNGKey(0), nf=nf, scale=scale,
                         modes=modes, stages=stages, arch=arch,
                         depth=depth if arch == "mxu" else None)
    stacked = stack_srnets_for_fast(params, modes=modes, stages=stages,
                                    scale=scale)
    run = jax.jit(lambda xx, st=stacked: srnets_predict_fast(
        st, xx, modes=modes, stages=stages, scale=scale,
        interpret=CPU))
    t0 = time.perf_counter()
    out = run(x)
    np.asarray(out[:1, :1, :2, :2])
    print(f"[{label}] compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    if CPU:
        assert np.isfinite(np.asarray(out)).all()
        continue
    dt = device_time(lambda: run(x), n=3)
    flops = 2 * macs_per_inpix(arch, nf, depth) * B * 3 * H * W
    print(f"[{label}] {dt * 1e3:.1f} ms/batch  "
          f"{out_px / dt / 1e6:.1f} MPix/s out  "
          f"MFU {flops / dt / PEAK * 100:.1f}%", flush=True)
