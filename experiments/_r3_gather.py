"""R3 scratch: isolated gather microbenchmark on the v5e (take 2).

In-cascade gathers consume indices computed IN-GRAPH (pad_clamp fusion,
S(1)-resident index vector).  Passing HBM-resident index arguments is
20x slower — so this harness computes pseudo-random indices on device
from a tiny seed argument, mirroring the cascade's conditions.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mulut_tpu.utils.profiling import device_time

L4 = 17 ** 4
N = 3_330_056  # in-cascade y row count per rotation

rng = np.random.default_rng(0)

cases = [
    ("y-rank   s8[2.0M, 80]", (L4 * 24, 80), np.int8, 1),
    ("y-rankpad s8[2.0M,128]", (L4 * 24, 128), np.int8, 1),
    ("y-c16    s8[83k, 256]", (L4, 256), np.int8, 1),
    ("sd-fold  s8[2.0M,384]", (L4 * 24, 384), np.int8, 1),
    ("s1-fold  s8[83k,  64]", (L4, 64), np.int8, 1),
    ("s1-y     s32[83k, 16]", (L4, 16), np.int32, 1),
    ("y-4x     s8[2.0M, 80]", (L4 * 24, 80), np.int8, 4),
]

for name, (rows, width), dt_, k in cases:
    tab = jnp.asarray(
        rng.integers(-127, 128, (rows, width), dtype=np.int8)
        if dt_ == np.int8 else
        rng.integers(-(2**31), 2**31 - 1, (rows, width), dtype=np.int64),
        dt_,
    )

    @jax.jit
    def g(t, seeds):
        outs = []
        for s in range(k):
            # on-device uniform random indices (NOT an arithmetic
            # progression — constant strides hit HBM bank pathologies)
            i = jax.random.randint(
                jax.random.PRNGKey(seeds[s]), (N,), 0, t.shape[0],
                dtype=jnp.int32,
            )
            i = jnp.pad(i, (0, 8))
            # full-width output materialized (as in-cascade); slicing here
            # would let XLA narrow the gather itself
            outs.append(jnp.take(t, i, axis=0))
        return outs

    seeds = jnp.arange(k, dtype=jnp.int32)
    outs = g(tab, seeds)
    np.asarray(outs[0][:1])
    dt = device_time(lambda: g(tab, seeds), n=3)
    print(f"{name}: {dt*1e3:7.2f} ms  {dt/(k*N)*1e9:5.2f} ns/row", flush=True)
    del tab, outs
