"""r5 probe: can Mosaic slice a (1, L) VMEM window at arbitrary static
lane offsets — the primitive the in-kernel tap-extraction (window)
kernel needs?

Three capability probes, each compiled AND timed on the chip:
  a) bf16 window, 25 static slices at offsets dy*Wp+dx (arbitrary
     mod 128), stacked to (25, T).
  b) f32 window, same slices, cast to bf16 after (the fallback if
     16-bit lane rotates are unsupported).
  c) b) + a (nf, 25) x (25, T) MXU matmul chain (the actual head shape:
     scattered-w1 head costs the same MXU passes as K=4).

Run:  python experiments/_r5_slice.py [--cpu]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mulut_tpu.utils import lab


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tile", type=int, default=4096)
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    lab.setup()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = args.cpu
    T = args.tile
    Wp = 484
    S = 2 * Wp + 2
    L = T + 2 * S
    offs = [S + dy * Wp + dx for dy in range(-2, 3) for dx in range(-2, 3)]
    n_tiles = 8
    rng = np.random.default_rng(0)
    win_f32 = rng.random((n_tiles, L)).astype(np.float32)  # stored (n_tiles, 1, L) on device
    nf = 128

    def extract_kernel(dtype_cast, w_ref, o_ref):
        rows = []
        for a in offs:
            r = w_ref[0, 0, a : a + T]
            if dtype_cast is not None:
                r = r.astype(dtype_cast)
            rows.append(r)
        o_ref[:] = jnp.stack(rows, axis=0)

    def run_extract(dtype, cast):
        win = jnp.asarray(win_f32[:, None, :], dtype)
        fn = pl.pallas_call(
            functools.partial(extract_kernel, cast),
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles * 25, T), cast or dtype),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((25, T), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )
        out = jax.jit(fn)(win)
        # correctness vs numpy
        want = np.stack([win_f32[i, a : a + T] for i in range(n_tiles)
                         for a in offs]).astype(
            np.float32 if cast is None else np.float32)
        got = np.asarray(out, np.float32)
        exact = np.array_equal(
            got, want.astype(np.asarray(out).dtype).astype(np.float32))
        dt = (lab.device_time(lambda: jax.jit(fn)(win), n=20)
              if not interp else 0.0)
        return {"exact": bool(exact), "us/tile": round(dt / n_tiles * 1e6, 1)}

    def chain_kernel(w_ref, w1, hw, o_ref):
        rows = [w_ref[0, 0, a : a + T].astype(jnp.bfloat16) for a in offs]
        R = jnp.stack(rows, axis=0)                       # (25, T) bf16
        acc = jnp.zeros((16, T), jnp.float32)
        for p in range(12):
            x = jnp.dot(w1[p], R, preferred_element_type=jnp.float32)
            xa = jnp.maximum(x, 0).astype(jnp.bfloat16)
            for d in range(2):
                x = jnp.dot(hw[d, p % 3], xa,
                            preferred_element_type=jnp.float32)
                xa = jnp.maximum(x, 0).astype(jnp.bfloat16)
            acc += jnp.dot(hw[0, p % 3][:16], xa,
                           preferred_element_type=jnp.float32)
        o_ref[:] = acc

    def run_chain():
        win = jnp.asarray(win_f32[:, None, :])
        w1 = jnp.asarray(rng.standard_normal((12, nf, 25)), jnp.bfloat16)
        hw = jnp.asarray(rng.standard_normal((2, 3, nf, nf)), jnp.bfloat16)
        fn = pl.pallas_call(
            chain_kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles * 16, T), jnp.float32),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((16, T), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )
        out = jax.jit(fn)(win, w1, hw)
        np.asarray(out[:1, :4])
        dt = (lab.device_time(lambda: jax.jit(fn)(win, w1, hw), n=20)
              if not interp else 0.0)
        # d2-pass FLOP model for the MFU denominator
        flops = n_tiles * T * 12 * 2 * (25 * nf + 2 * nf * nf + 16 * nf)
        return {"us/tile": round(dt / n_tiles * 1e6, 1),
                "mfu": round(lab.mfu(flops, dt), 3) if dt else None}

    cfgs = [
        ("bf16-slice", lambda: run_extract(jnp.bfloat16, None)),
        ("f32-slice-cast", lambda: run_extract(jnp.float32, jnp.bfloat16)),
        ("f32-slice", lambda: run_extract(jnp.float32, None)),
        ("chain-d2", lambda: run_chain()),
    ]
    lab.ladder(cfgs, lambda c: c[1](), label=lambda c: c[0])


if __name__ == "__main__":
    main()
