"""R3 scratch: trace the bench cascade and print the per-op breakdown."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time, op_breakdown

scale, stages, modes, interval = 4, 2, "sdy", 4
L = 17
H, W, B = 270, 480, 8

rng = np.random.default_rng(0)
luts = {}
for s in range(stages):
    v = scale * scale if s + 1 == stages else 1
    for m in modes:
        arr = np.load(
            "/root/reference/models/sr_x2sdy/"
            f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
        ).reshape(-1, v)
        luts[f"s{s + 1}_{m}"] = arr.astype(np.int8)
eluts = prepare_expanded_luts_cached(luts, interval=interval)
img = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)


@jax.jit
def run(tabs, x):
    return lut_cascade_int(
        tabs, x, stages=stages, modes=modes, scale=scale,
        interval=interval, expanded=True,
    )

eluts = jax.device_put(eluts)
np.asarray(run(eluts, img)[0, 0, 0, :4])

dt = device_time(lambda: run(eluts, img), n=3)
print(f"device_time: {dt*1e3:.1f} ms/batch = {B*H*W*16/1e6/dt:.1f} MPix/s")

TRACE = "/tmp/r3_trace"
jax.profiler.start_trace(TRACE)
for _ in range(3):
    out = run(eluts, img)
np.asarray(out[0, 0, 0, :4])
jax.profiler.stop_trace()

rows = op_breakdown(TRACE, top=40)
tot = sum(ms for ms, _, _ in rows)
print(f"total traced {tot:.1f} ms over 3 runs -> {tot/3:.1f} ms/run")
for ms, name, long_name in rows:
    print(f"{ms/3:8.2f} ms  {name}  | {long_name[:140]}")
