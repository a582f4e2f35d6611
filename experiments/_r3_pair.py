"""R3 scratch: block-diagonal rotation-PAIR stage-ensemble kernel.

Today's kernel: 12 (mode x rotation) passes, each 5 dependent matmuls
with N=64 (half the MXU lanes idle) and an N=16 head (7/8 idle):
9 MXU units/pass for 46080 useful MACs -> 31% theoretical cap, ~16.5%
measured (chain stalls).

This variant pairs the two rotations (r,r+1) of a mode into ONE matmul
chain with block-diagonal weights over a [A1 B1 A2 B2 ...] interleaved
scratch layout: every layer reads a CONTIGUOUS (T, 128(k-1)) slice and
writes a contiguous 128-col block (full lanes, no sub-slicing).  Unit
accounting: L2..L5 = 1+2+3+4 = 10 units/pair, head (640->32) 5/pair ->
7.5 units/pass = 37.5% cap.  The two pairs of each mode interleave
layer-major (independent chains) to hide MXU drains at only 2 scratch
buffers.

Usage: _r3_pair.py [--cpu] : interpret parity vs stage_ensemble_apply
       _r3_pair.py         : in-context timing via srnets_predict_fast
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

TILE = 1024


def pair_stack(stacked: dict, nf: int, out_pad: int = 16) -> dict:
    """Host prep: block-diagonal paired weights from stack_stage_params
    output.  Scratch layout [A1 B1 A2 B2 A3 B3 A4 B4 A5 B5] (64 each).

    PWk (M, 128(k-1), 128): rows for A_j feed cols 0:64 with wk rows
    j*nf..(j+1)*nf, rows for B_j feed cols 64:128.  PW6 (M, 640, 64):
    pair p reads cols 32p:32(p+1) = [head_{r=2p} | head_{r=2p+1}].
    """
    M = stacked["w1"].shape[0]
    out = {"w1": stacked["w1"], "b1": stacked["b1"]}
    for k in range(2, 6):
        wk = stacked[f"w{k}"]                     # (M, nf(k-1), 64) bf16
        bk = stacked[f"b{k}"]                     # (M, 64)
        z = jnp.zeros((M, nf, 64), wk.dtype)
        blocks = []
        for j in range(k - 1):
            rows = wk[:, j * nf: (j + 1) * nf, :]
            top = jnp.concatenate([rows, z], axis=2)       # (M, nf, 128)
            bot = jnp.concatenate([z, rows], axis=2)
            blocks.append(jnp.concatenate([top, bot], axis=1))
        out[f"w{k}"] = jnp.concatenate(blocks, axis=1)     # (M,128(k-1),128)
        out[f"b{k}"] = jnp.concatenate([bk, bk], axis=1)   # (M, 128)
    w6 = stacked["w6"]                            # (M, 5nf, 4*out_pad)
    b6 = stacked["b6"]                            # (M, 4*out_pad)
    z16 = jnp.zeros((M, nf, 16), w6.dtype)
    rsl = [w6[:, :, out_pad * r: out_pad * r + 16] for r in range(4)]
    blocks = []
    for j in range(5):
        rj = [r[:, j * nf: (j + 1) * nf, :] for r in rsl]
        top = jnp.concatenate([rj[0], z16, rj[2], z16], axis=2)
        bot = jnp.concatenate([z16, rj[1], z16, rj[3]], axis=2)
        blocks.append(jnp.concatenate([top, bot], axis=1))  # (M, 128, 64)
    out["w6"] = jnp.concatenate(blocks, axis=1)             # (M, 640, 64)
    out["b6"] = jnp.concatenate(
        [b6[:, out_pad * r: out_pad * r + 16] for r in range(4)], axis=1)
    return out


def _pair_kernel(nf, n_modes, out_pad,
                 t_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
                 out_ref, s0, s1):
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    scr = (s0, s1)
    for mi in range(n_modes):
        # layer 1 (VPU): rotation r writes 64-col block of pair scratch
        for p in range(2):
            for jr in range(2):
                r = 2 * p + jr
                col = (mi * 4 + r) * 4
                t = t_ref[:, col:col + 4]
                x = None
                for k in range(4):
                    term = t[:, k:k + 1] * w1[mi, k:k + 1, :]
                    x = term if x is None else x + term
                scr[p][:, 64 * jr: 64 * jr + nf] = jnp.maximum(
                    x + b1[mi][None, :], 0).astype(jnp.bfloat16)
        # layers 2..5: block-diagonal pair matmuls, 2-way interleaved
        for k, (w, b) in enumerate(
            ((w2, b2), (w3, b3), (w4, b4), (w5, b5)), start=2
        ):
            kw = 128 * (k - 1)
            for p in range(2):
                xk = jnp.dot(scr[p][:, 0:kw], w[mi, 0:kw, :],
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(xk + b[mi][None, :].astype(jnp.float32), 0)
                scr[p][:, kw:kw + 128] = xk.astype(jnp.bfloat16)
        # paired heads: (T, 640) x (640, 32) -> [r=2p | r=2p+1] blocks
        for p in range(2):
            o = jnp.dot(scr[p][:, :], w6[mi, :, 32 * p: 32 * (p + 1)],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, 32 * p: 32 * (p + 1)][None, :].astype(jnp.float32))
            acc = acc + jnp.round(o[:, 0:16] * 127.0)
            acc = acc + jnp.round(o[:, 16:32] * 127.0)
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("n_modes", "out_pad", "interpret"))
def pair_apply(paired, taps, *, n_modes, out_pad=16, interpret=False):
    nf = paired["w1"].shape[2]
    n = taps.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        taps = jnp.pad(taps, [(0, n_pad - n), (0, 0)])
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
    width = 16 * n_modes
    out = pl.pallas_call(
        functools.partial(_pair_kernel, nf, n_modes, out_pad),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.float32),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] + wspecs,
        out_specs=pl.BlockSpec((TILE, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, 640), jnp.bfloat16)] * 2,
        interpret=interpret,
    )(
        taps, paired["w1"], paired["b1"], paired["w2"], paired["b2"],
        paired["w3"], paired["b3"], paired["w4"], paired["b4"],
        paired["w5"], paired["b5"], paired["w6"], paired["b6"],
    )
    return out[:n]


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
    for stage, up in ((1, 1), (2, scale)):
        stacked = uk.stack_stage_params(
            params, stage=stage, modes=modes, upscale=up)
        taps = jnp.asarray(
            rng.random((1000, 16 * len(modes)), np.float32), jnp.bfloat16)
        ref = np.asarray(uk.stage_ensemble_apply(
            stacked, taps, n_modes=len(modes), interpret=True))
        got = np.asarray(pair_apply(
            pair_stack(stacked, NF), taps, n_modes=len(modes),
            interpret=True))
        exact = np.array_equal(got, ref)
        print(f"[stage {stage}] exact={exact} "
              f"maxdiff={np.abs(got - ref).max()}", flush=True)
    sys.exit(0)

from mulut_tpu.utils.profiling import device_time

H, W, B = 270, 480, 8
x = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float32))
flop_per_inpix = 2 * 46336 * 12 * stages
PEAK = 197e12
orig = uk.stage_ensemble_apply


def paired_ensemble_apply(stacked, taps, *, n_modes, out_pad=16,
                          interpret=False):
    return pair_apply(pair_stack(stacked, NF), taps, n_modes=n_modes,
                      out_pad=out_pad, interpret=interpret)


for tag in ("base", "pair"):
    uk.stage_ensemble_apply = orig if tag == "base" else paired_ensemble_apply
    stacked = stack_srnets_for_fast(
        params, modes=modes, stages=stages, scale=scale)
    run = jax.jit(lambda st, xx: srnets_predict_fast(
        st, xx, modes=modes, stages=stages, scale=scale))
    t0 = time.perf_counter()
    np.asarray(run(stacked, x)[:1, :1, 0, :4])
    print(f"[{tag}] compile {time.perf_counter()-t0:.0f}s", flush=True)
    dt = device_time(lambda: run(stacked, x), n=3)
    inpix = B * 3 * H * W
    tput = inpix * 16 / 1e6 / dt
    mfu = inpix * flop_per_inpix / dt / PEAK
    print(f"[{tag}] {dt*1e3:.1f} ms/batch = {tput:.1f} MPix/s out, "
          f"MFU {mfu*100:.1f}%", flush=True)
