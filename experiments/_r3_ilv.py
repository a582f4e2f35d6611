"""Find a Mosaic-compilable (16, w) -> (4, 4w) interleave."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

w = 480
variant = sys.argv[1]


def kernel(in_ref, out_ref):
    val = in_ref[:]                       # (16, w) f32
    if variant == "v1":
        t = val.reshape(4, 4, w).transpose(0, 2, 1).reshape(4, 4 * w)
    elif variant == "v2":
        vt = val.T                        # (w, 16)
        rows = [vt[:, 4 * py:4 * py + 4].reshape(1, 4 * w)
                for py in range(4)]
        t = jnp.concatenate(rows, axis=0)
    elif variant == "v3":
        # lane-position select: out[py, l] = val[4*py + l%4, l//4]
        # build per-px dilated vectors via repeat + mask
        l = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * w), 1)
        rows = []
        for py in range(4):
            acc = jnp.zeros((1, 4 * w), jnp.float32)
            for px in range(4):
                src = val[4 * py + px, :]                    # (w,)
                wide = pltpu.repeat(src.reshape(1, w), 4, axis=1)  # (1,4w)?
                acc = acc + jnp.where((l[py:py + 1] % 4) == px, wide, 0.0)
            rows.append(acc)
        t = jnp.concatenate(rows, axis=0)
    elif variant == "v5":
        t = None
        for py in range(4):
            for px in range(4):
                out_ref[py, px::4] = val[4 * py + px, :]
        return
    out_ref[:] = t


x = jnp.asarray(np.arange(16 * w, dtype=np.float32).reshape(16, w))
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((4, 4 * w), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x)
got = np.asarray(out)
want = np.asarray(x).reshape(4, 4, w).transpose(0, 2, 1).reshape(4, 4 * w)
print(variant, "OK" if np.array_equal(got, want) else "WRONG-VALUES")
