"""R3 scratch: batch-size sweep of the tail-kernel cascade.

r2 measured B=16 at 68.4 vs 66.0 MPix/s in the prod2 era; re-check at
the tail-kernel era (and B=12) — if >5% win and HBM fits, bump bench.py
batch (metric is output MPix/s, unchanged).

Usage: _r3_b16.py [B ...]   (default 8 12 16)
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.ops import tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time

scale, stages, modes, interval = 4, 2, "sdy", 4
H, W = 270, 480

rng = np.random.default_rng(0)
luts = {}
for s in range(stages):
    v = scale * scale if s + 1 == stages else 1
    for m in modes:
        luts[f"s{s + 1}_{m}"] = np.load(
            "/root/reference/models/sr_x2sdy/"
            f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
        ).reshape(-1, v).astype(np.int8)
eluts = jax.device_put(prepare_expanded_luts_cached(
    luts, interval=interval, shared_quad=True))

run = jax.jit(functools.partial(
    tk.lut_cascade_packed, stages=stages, modes=modes,
    scale=scale, interval=interval))

batches = [int(a) for a in sys.argv[1:]] or [8, 12, 16]
for B in batches:
    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)
    np.asarray(run(eluts, img)[:1, 0, :4])
    dt = device_time(lambda: run(eluts, img), n=3)
    print(f"B={B:3d}: {dt*1e3:7.1f} ms/batch = "
          f"{B*H*W*16/1e6/dt:6.1f} MPix/s")
