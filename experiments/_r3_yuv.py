"""R3: measure the YUV deployment mode (VERDICT #4).

(a) device-only cascade throughput on a 1-channel (luma) batch — each
    1-ch pass yields a full color output frame in YUV mode, so the
    effective output rate is B*H*W*scale^2 / dt;
(b) Set5 PSNR/SSIM + wall time via sr/Test.py --yuv (run separately).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.ops import tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
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

eluts = jax.device_put(
    prepare_expanded_luts_cached(luts, interval=interval, shared_quad=True)
)
run = jax.jit(functools.partial(
    tk.lut_cascade_packed, stages=stages, modes=modes,
    scale=scale, interval=interval,
))

rng = np.random.default_rng(0)
for C, name in ((3, "rgb"), (1, "yuv-luma")):
    img = jnp.asarray(
        rng.integers(0, 256, (B, C, H, W), dtype=np.int64), jnp.int32
    )
    t0 = time.perf_counter()
    np.asarray(run(eluts, img)[:1, 0, :4])
    print(f"[{name}] compile {time.perf_counter()-t0:.0f}s", flush=True)
    dt = device_time(lambda: run(eluts, img), n=4)
    eff = B * H * W * scale * scale / 1e6 / dt
    print(f"[{name}] C={C} {dt*1e3:.1f} ms/batch -> "
          f"{eff:.1f} effective full-frame MPix/s", flush=True)
