"""R3 scratch: stage-2 mode EMISSION ORDER vs VMEM table staging.

The 159 ms trace shows XLA stages the two 85.5 MB fold16 s/d tables
S(1) but leaves the 21.4 MB corner16-y table HBM-resident (its 4
gathers run at 3.09 ns/row = 41.2 ms, vs ~1.5 expected from VMEM).
Hypothesis: the scheduler walks the program in emission order (s, d,
then y) and has spent its VMEM staging budget by the time the y
gathers appear.  Reordering the Python mode loop so y's gathers are
emitted FIRST is output-bit-exact (every accumulation is an
integer-valued-f32 / int32 sum — order-independent), so if staging
follows emission order this is a free ~20 ms.

Usage: _r3_order.py [--cpu]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from mulut_tpu.ops import tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time

scale, stages, interval = 4, 2, 4
H, W, B = 270, 480, 8
if "--cpu" in sys.argv:
    H, W, B = 24, 32, 2
interp = "--cpu" in sys.argv

rng = np.random.default_rng(0)
luts = {}
for s in range(stages):
    v = scale * scale if s + 1 == stages else 1
    for m in "sdy":
        try:
            luts[f"s{s + 1}_{m}"] = np.load(
                "/root/reference/models/sr_x2sdy/"
                f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
            ).reshape(-1, v).astype(np.int8)
        except OSError:
            L = 2 ** (8 - interval) + 1
            luts[f"s{s + 1}_{m}"] = rng.integers(
                -127, 128, (L ** 4, v), dtype=np.int64).astype(np.int8)

eluts = prepare_expanded_luts_cached(
    luts, interval=interval, shared_quad=True,
    corner16_modes="y", fold16_modes="sd", k128_stage1="sd",
    int8_stage1="y")
eluts = jax.device_put(eluts)
img = jnp.asarray(
    rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)

golden = None
for order in ["sdy", "yds", "ysd", "dys"]:
    run = jax.jit(functools.partial(
        tk.lut_cascade_packed, stages=stages, modes=order,
        scale=scale, interval=interval, interpret=interp))
    out = run(eluts, img)
    u = tk.unpack_u32(np.asarray(out), (B, 3), H, W, scale)
    if golden is None:
        golden = u
        ok = "golden"
    else:
        ok = "MATCH" if np.array_equal(u, golden) else "MISMATCH"
    if interp:
        print(f"[{order}] parity={ok}")
        continue
    dt = device_time(lambda: run(eluts, img), n=3)
    print(f"[{order}] {dt*1e3:.1f} ms/batch = "
          f"{B*H*W*scale*scale/1e6/dt:.1f} MPix/s  parity={ok}")
