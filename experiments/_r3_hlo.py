"""Dump optimized HLO of the bench cascade; find the while loops."""
import re

import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts_cached

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
eluts = prepare_expanded_luts_cached(luts, interval=interval)
img = jnp.zeros((B, 3, H, W), jnp.int32)


@jax.jit
def run(tabs, x):
    return lut_cascade_int(
        tabs, x, stages=stages, modes=modes, scale=scale,
        interval=interval, expanded=True,
    ).astype(jnp.uint8)


c = run.lower(eluts, img).compile()
txt = c.as_text()
print("HLO len", len(txt))
open("/tmp/r3_opt.hlo", "w").write(txt)

# find while ops and their body roots
for m in re.finditer(r"%?(while[.\d]*) = .*condition=%?([\w.\-]+), body=%?([\w.\-]+)", txt):
    print("WHILE:", m.group(0)[:200])
