"""R3 scratch: stage-2 y table variants inside the KERNEL cascade.

Variants (dispatched by quad_flat on row width):
  rank    — shared rank table, 80 B rows (current default)
  rankpad — shared rank table zero-padded to 128 B rows (1 tile/row)
  c16     — shared 16-corner table, 256 B rows, 21 MB (locality)
Bit-checks each vs the pure-XLA cascade on a small image, then times the
bench batch.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.ops import simplex_tables as st
from mulut_tpu.ops import tail_kernel as tk
from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time

which = sys.argv[1:] or ["rank", "rankpad", "c16"]

scale, stages, modes, interval = 4, 2, "sdy", 4
L4 = 17 ** 4
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

base_tabs = prepare_expanded_luts_cached(luts, interval=interval)
ktabs = prepare_expanded_luts_cached(luts, interval=interval, shared_quad=True)

img = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)
chk = np.asarray(rng.integers(0, 256, (1, 40, 56), dtype=np.int64), np.int32)
exp = np.asarray(
    jax.jit(lambda t, x: lut_cascade_int(
        t, x, stages=stages, modes=modes, scale=scale, interval=interval,
        expanded=True))(jax.device_put(base_tabs), jnp.asarray(chk))
)

run = jax.jit(functools.partial(
    tk.lut_cascade_packed, stages=stages, modes=modes,
    scale=scale, interval=interval,
))

for cfg in which:
    tabs = dict(ktabs)
    t0 = time.perf_counter()
    if cfg == "rankpad":
        t = ktabs["s2_y"]  # (L4*24, 80)
        tabs["s2_y"] = np.pad(t, ((0, 0), (0, 48)))
    elif cfg == "c16":
        tabs["s2_y"] = st.expand_lut(luts["s2_y"], interval).reshape(L4, 256)
    print(f"[{cfg}] build {time.perf_counter()-t0:.1f}s shape "
          f"{tabs['s2_y'].shape}", flush=True)
    dtabs = jax.device_put(tabs)
    t0 = time.perf_counter()
    packed = run(dtabs, jnp.asarray(chk))
    got = tk.unpack_u32(packed, (1,), 40, 56, scale).astype(np.int32)
    ok = "MATCH" if np.array_equal(got, exp) else "MISMATCH!!"
    print(f"[{cfg}] compile+check {time.perf_counter()-t0:.0f}s {ok}",
          flush=True)
    def sync():
        np.asarray(run(dtabs, img)[:1, 0, :4])
    sync()
    dt = device_time(lambda: run(dtabs, img), n=3)
    print(f"[{cfg}] {dt*1e3:.1f} ms/batch = {B*H*W*16/1e6/dt:.1f} MPix/s",
          flush=True)
    del dtabs
