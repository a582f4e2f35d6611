"""R3 scratch: PARTIAL layer-interleaving of the stage-ensemble kernel.

The shipped kernel runs 12 (mode x rotation) passes sequentially; each
pass is a chain of 5 dependent matmuls -> MXU drains (~55% pass
efficiency in-context).  Full 12-way layer-major interleave won 2.2x
standalone but lost in-context (12x scratch VMEM pressure).  This
variant interleaves only IV passes at a time (the 4 rotations of one
mode for IV=4 — same weights, so weight refs stay hot): consecutive
matmuls are independent at only IV x scratch.

Usage: _r3_iv.py [IV ...] [--cpu] [--trace]
  --cpu: interpret-mode parity check vs stage_ensemble_apply.
  else:  in-context timing via srnets_predict_fast (full 2-stage net).
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

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

IVS = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4]
TILE = 1024


def _iv_kernel(nf, n_modes, out_pad, iv,
               t_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
               out_ref, *cats):
    P = n_modes * 4
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    for g in range(P // iv):
        ps = [g * iv + j for j in range(iv)]
        # layer 1 (VPU) for the group
        for j, p in enumerate(ps):
            mi = p // 4
            col = p * 4
            t = t_ref[:, col:col + 4]
            x = None
            for k in range(4):
                term = t[:, k:k + 1] * w1[mi, k:k + 1, :]
                x = term if x is None else x + term
            cats[j][:, 0:nf] = jnp.maximum(
                x + b1[mi][None, :], 0).astype(jnp.bfloat16)
        # layers 2..5: interleave the group's matmuls (independent chains)
        for li, (w, b) in enumerate(
            ((w2, b2), (w3, b3), (w4, b4), (w5, b5)), start=1
        ):
            for j, p in enumerate(ps):
                mi = p // 4
                xk = jnp.dot(cats[j][:, 0:nf * li], w[mi],
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(xk + b[mi][None, :].astype(jnp.float32), 0)
                cats[j][:, nf * li:nf * (li + 1)] = xk.astype(jnp.bfloat16)
        # heads
        for j, p in enumerate(ps):
            mi, r = p // 4, p % 4
            o = jnp.dot(cats[j][:, :],
                        w6[mi, :, out_pad * r:out_pad * (r + 1)],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r:out_pad * (r + 1)][None, :]
                .astype(jnp.float32))
            acc = acc + jnp.round(o * 127.0)
    out_ref[:] = acc


def make_iv_apply(iv):
    @functools.partial(jax.jit,
                       static_argnames=("n_modes", "out_pad", "interpret"))
    def iv_apply(stacked, taps, *, n_modes, out_pad=16, interpret=False):
        nf = stacked["w1"].shape[2]
        n = taps.shape[0]
        n_pad = -(-n // TILE) * TILE
        if n_pad != n:
            taps = jnp.pad(taps, [(0, n_pad - n), (0, 0)])
        wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
        width = 16 * n_modes
        out = pl.pallas_call(
            functools.partial(_iv_kernel, nf, n_modes, out_pad, iv),
            out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
            grid=(n_pad // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, width), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ] + wspecs,
            out_specs=pl.BlockSpec((TILE, out_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TILE, 5 * nf), jnp.bfloat16)] * iv,
            interpret=interpret,
        )(
            taps, stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
            stacked["w3"], stacked["b3"], stacked["w4"], stacked["b4"],
            stacked["w5"], stacked["b5"], stacked["w6"], stacked["b6"],
        )
        return out[:n]
    return iv_apply


scale, stages, modes = 4, 2, "sdy"
NF = 64
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
from mulut_tpu.models.blocks import init_mulut_unit
from mulut_tpu.models.srnet import srnets_predict_fast, stack_srnets_for_fast

params = {}
for s in range(stages):
    up = scale if s + 1 == stages else 1
    for m in modes:
        key, k2 = jax.random.split(key)
        params[f"s{s + 1}_{m}"] = init_mulut_unit(
            k2, nf=NF, upscale=up, dense=True)

if "--cpu" in sys.argv:
    stacked = uk.stack_stage_params(
        params, stage=2, modes=modes, upscale=scale)
    taps = jnp.asarray(
        rng.random((1000, 16 * len(modes)), np.float32), jnp.bfloat16)
    ref = np.asarray(uk.stage_ensemble_apply(
        stacked, taps, n_modes=len(modes), interpret=True))
    for iv in IVS:
        got = np.asarray(make_iv_apply(iv)(
            stacked, taps, n_modes=len(modes), interpret=True))
        ok = np.array_equal(got, ref)
        print(f"[iv={iv}] parity {'MATCH' if ok else 'MISMATCH '}"
              f"{np.abs(got-ref).max() if not ok else ''}", flush=True)
    sys.exit(0)

from mulut_tpu.utils.profiling import device_time

H, W, B = 270, 480, 8
x = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float32))
flop_per_inpix = 2 * 46336 * 12 * stages
PEAK = 197e12
orig = uk.stage_ensemble_apply

for iv in [None] + IVS:
    uk.stage_ensemble_apply = orig if iv is None else make_iv_apply(iv)
    stacked = stack_srnets_for_fast(
        params, modes=modes, stages=stages, scale=scale)
    run = jax.jit(lambda st, xx: srnets_predict_fast(
        st, xx, modes=modes, stages=stages, scale=scale))
    t0 = time.perf_counter()
    np.asarray(run(stacked, x)[:1, :1, 0, :4])
    tag = "base" if iv is None else f"iv={iv}"
    print(f"[{tag}] compile {time.perf_counter()-t0:.0f}s", flush=True)
    dt = device_time(lambda: run(stacked, x), n=3)
    inpix = B * 3 * H * W
    tput = inpix * 16 / 1e6 / dt
    mfu = inpix * flop_per_inpix / dt / PEAK
    print(f"[{tag}] {dt*1e3:.1f} ms/batch = {tput:.1f} MPix/s out, "
          f"MFU {mfu*100:.1f}%", flush=True)
