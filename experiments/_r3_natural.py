"""R3 scratch: natural-content input trace (agenda #7, PERF.md note only).

Tiles Set5 butterfly to the bench shape (8x3x270x480) and times the
tail-kernel cascade — quantifies the gather-locality effect of natural
content vs the bench's random pixels.  bench.py STAYS random for
round-over-round comparability.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.ops import tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils import load_image
from mulut_tpu.utils.profiling import device_time

scale, stages, modes, interval = 4, 2, "sdy", 4
H, W, B = 270, 480, 8

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

lr = load_image("/root/reference/data/SRBenchmark/Set5/LR_bicubic/X4/"
                "butterfly.png").astype(np.int32).transpose(2, 0, 1)
c, h0, w0 = lr.shape
reps_y = -(-H // h0)
reps_x = -(-W // w0)
tiled = np.tile(lr, (reps_y, reps_x))[:, :H, :W]
img = jnp.asarray(np.broadcast_to(tiled, (B, c, H, W)).copy(), jnp.int32)

run = jax.jit(functools.partial(
    tk.lut_cascade_packed, stages=stages, modes=modes,
    scale=scale, interval=interval))
np.asarray(run(eluts, img)[:1, 0, :4])
dt = device_time(lambda: run(eluts, img), n=3)
print(f"natural content: {dt*1e3:.1f} ms/batch = "
      f"{B*H*W*16/1e6/dt:.1f} MPix/s")
