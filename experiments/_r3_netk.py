"""R3 scratch: layer-major interleaved stage-ensemble kernel.

The shipped kernel runs 12 (mode x rotation) tap-MLP passes sequentially;
each pass is a chain of 5 DEPENDENT matmuls, so the MXU drains ~every
matmul.  This variant runs layer-by-layer across all passes — consecutive
matmuls are independent — with a (12, T, 5nf) concat scratch.

CPU: numeric parity vs stage_ensemble_apply (interpret).  TPU: wall time.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import mulut_tpu.ops.unit_kernel as uk

TILE = int(next((a for a in sys.argv[1:] if a.isdigit()), 512))


def _ilv_kernel(nf: int, n_modes: int, out_pad: int,
                t_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
                out_ref, cat):
    P = n_modes * 4
    T = t_ref.shape[0]
    # layer 1 (VPU): all passes
    for mi in range(n_modes):
        for r in range(4):
            p = mi * 4 + r
            col = p * 4
            t = t_ref[:, col: col + 4]
            x = None
            for k in range(4):
                term = t[:, k: k + 1] * w1[mi, k: k + 1, :]
                x = term if x is None else x + term
            cat[p, :, 0:nf] = jnp.maximum(
                x + b1[mi][None, :], 0).astype(jnp.bfloat16)
    # layers 2..5 (MXU): layer-major — consecutive matmuls independent
    for li, (w, b) in enumerate(
        ((w2, b2), (w3, b3), (w4, b4), (w5, b5)), start=1
    ):
        for p in range(P):
            mi = p // 4
            xk = jnp.dot(cat[p, :, 0: nf * li], w[mi],
                         preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + b[mi][None, :].astype(jnp.float32), 0)
            cat[p, :, nf * li: nf * (li + 1)] = xk.astype(jnp.bfloat16)
    # layer 6 + tanh + rotation rounding accumulate
    acc = jnp.zeros((T, out_pad), jnp.float32)
    for p in range(P):
        mi, r = p // 4, p % 4
        o = jnp.dot(cat[p], w6[mi, :, out_pad * r: out_pad * (r + 1)],
                    preferred_element_type=jnp.float32)
        o = jnp.tanh(
            o + b6[mi, out_pad * r: out_pad * (r + 1)][None, :]
            .astype(jnp.float32))
        acc = acc + jnp.round(o * 127.0)
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("n_modes", "out_pad", "interpret"))
def ilv_apply(stacked, taps, *, n_modes, out_pad=16, interpret=False):
    nf = stacked["w1"].shape[2]
    n = taps.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        taps = jnp.pad(taps, [(0, n_pad - n), (0, 0)])
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
    width = 16 * n_modes
    out = pl.pallas_call(
        functools.partial(_ilv_kernel, nf, n_modes, out_pad),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] + wspecs,
        out_specs=pl.BlockSpec((TILE, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_modes * 4, TILE, 5 * nf), jnp.bfloat16)
        ],
        interpret=interpret,
    )(
        taps, stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
        stacked["w3"], stacked["b3"], stacked["w4"], stacked["b4"],
        stacked["w5"], stacked["b5"], stacked["w6"], stacked["b6"],
    )
    return out[:n]


def main():
    from mulut_tpu.models.blocks import init_mulut_unit
    from mulut_tpu.utils.profiling import device_time

    on_cpu = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    modes, stage, scalev = "sdy", 2, 4
    params = {}
    for m in modes:
        key, k2 = jax.random.split(key)
        params[f"s{stage}_{m}"] = init_mulut_unit(
            k2, nf=64, upscale=scalev, dense=True)
    stacked = uk.stack_stage_params(
        params, stage=stage, modes=modes, upscale=scalev)

    N = 200_000 if on_cpu else 3_110_400
    taps = jnp.asarray(
        rng.random((N, 48), dtype=np.float32), jnp.bfloat16)

    if on_cpu:
        a = uk.stage_ensemble_apply(stacked, taps, n_modes=3, interpret=True)
        b = ilv_apply(stacked, taps, n_modes=3, interpret=True)
        print("allclose:", np.allclose(np.asarray(a), np.asarray(b)),
              "maxdiff:", float(np.abs(np.asarray(a) - np.asarray(b)).max()))
        return

    for name, fn in (("base", uk.stage_ensemble_apply), ("ilv", ilv_apply)):
        t0 = time.perf_counter()
        out = fn(stacked, taps, n_modes=3)
        np.asarray(out[:1, :1])
        print(f"[{name}] compile {time.perf_counter()-t0:.0f}s", flush=True)
        dt = device_time(lambda: fn(stacked, taps, n_modes=3), n=3)
        print(f"[{name}] {dt*1e3:.2f} ms  {N/dt/1e6:.0f} Mrow/s "
              f"({dt/N*1e9:.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
