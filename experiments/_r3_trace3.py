"""R3 scratch: trace the KERNEL-path bench cascade, per-op breakdown."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.ops import tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time, op_breakdown

scale, stages, modes, interval = 4, 2, "sdy", 4
H, W, B = 270, 480, 8

rng = np.random.default_rng(0)
luts = {}
for s in range(stages):
    v = scale * scale if s + 1 == stages else 1
    for m in modes:
        luts[f"s{s + 1}_{m}"] = np.load(
            "/root/reference/models/sr_x2sdy/"
            f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
        ).reshape(-1, v).astype(np.int8)
eluts = prepare_expanded_luts_cached(luts, interval=interval, shared_quad=True, corner16_modes="y", fold16_modes="sd", k128_stage1="sd", int8_stage1="y")
img = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)

run = jax.jit(functools.partial(
    tk.lut_cascade_packed, stages=stages, modes=modes,
    scale=scale, interval=interval,
))
eluts = jax.device_put(eluts)
np.asarray(run(eluts, img)[:1, 0, :4])

dt = device_time(lambda: run(eluts, img), n=3)
print(f"device_time: {dt*1e3:.1f} ms/batch = {B*H*W*16/1e6/dt:.1f} MPix/s")

TRACE = "/tmp/r3_trace2"
jax.profiler.start_trace(TRACE)
for _ in range(3):
    out = run(eluts, img)
np.asarray(out[:1, 0, :4])
jax.profiler.stop_trace()

rows = op_breakdown(TRACE, top=1000)
tot = sum(ms for ms, _, _ in rows)
print(f"total traced {tot:.1f} ms over 3 runs -> {tot/3:.1f} ms/run "
      f"({len(rows)} distinct ops)")
for ms, name, long_name in rows[:60]:
    print(f"{ms/3:8.2f} ms  {name}  | {long_name[:150]}")
rest = sum(ms for ms, _, _ in rows[60:])
print(f"{rest/3:8.2f} ms  <{max(0, len(rows)-60)} remaining ops>")

from mulut_tpu.utils.profiling import device_timeline
tl = device_timeline(TRACE, top_gaps=15)
print(f"\ntimeline: span {tl['span_ms']/3:.1f} busy {tl['busy_ms']/3:.1f} "
      f"idle {tl['idle_ms']/3:.1f} ms/run")
for g, a, b in tl["gaps"]:
    print(f"  gap {g:8.3f} ms  after {a[:60]}  before {b[:60]}")
