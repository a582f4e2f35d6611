"""R3: W8A8 v2 — requant-form bisect (throughput) + per-channel quality.

Session 9 findings driving this: (a) the int8 chain probe (_r3_i8.py)
hits 312 Tops/s with integer-domain requant, while the shipped W8A8
kernel ran at 5.8-15.7% of int8 peak — prime suspects are the f32
round-trip between MXU ops and the 16-lane int8 head slicing; (b) the
v1 per-LAYER scalar activation scales lost 6.4 dB (37.09 vs 43.49 on
the synthetic harness) — starved channels got a handful of codes.

v2 (ops/quant.py) folds per-CHANNEL activation scales into weight rows
and offers three kernel datapaths to bisect the slowdown:
  f32    — v1 layout (baseline),
  f32w6  — f32 requant + lane-sliceless (M,4,nf,P) head,
  int    — integer fixed-point requant + sliceless head.

Usage: _r3_q2.py [--cpu] [--iters N]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from mulut_tpu.models.srnet import (
    init_srnets,
    srnets_predict,
    srnets_predict_fast,
    stack_srnets_for_fast,
)
from mulut_tpu.ops.quant import quantize_srnets_for_fast
from mulut_tpu.utils.profiling import device_time
from mulut_tpu.utils.xla_opts import enable_compilation_cache

enable_compilation_cache()

CPU = "--cpu" in sys.argv
scale, stages, modes = 4, 2, "sdy"
H, W, B = (6, 7, 1) if CPU else (270, 480, 8)
PEAK_BF16, PEAK_I8 = 197e12, 394e12
out_px = B * 3 * H * W * scale * scale

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float32))


def macs_per_inpix(nf, depth):
    total = 0
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        total += 12 * (4 * nf + depth * nf * nf + nf * v)
    return total


print("=== throughput (requant-form bisect) ===", flush=True)
for label, nf, depth in [("mxu-nf128-d2", 128, 2), ("mxu-nf128-d3", 128, 3),
                         ("mxu-nf256-d2", 256, 2),
                         ("mxu-nf256-d3", 256, 3)]:
    params = init_srnets(jax.random.PRNGKey(0), nf=nf, scale=scale,
                         modes=modes, stages=stages, arch="mxu", depth=depth)
    for kind in ("bf16", "f32", "f32w6", "int"):
        try:
            if kind == "bf16":
                st = stack_srnets_for_fast(params, modes=modes,
                                           stages=stages, scale=scale)
            else:
                st = quantize_srnets_for_fast(params, modes=modes,
                                              stages=stages, scale=scale,
                                              requant=kind)
            run = jax.jit(lambda xx, st=st: srnets_predict_fast(
                st, xx, modes=modes, stages=stages, scale=scale,
                interpret=CPU))
            t0 = time.perf_counter()
            out = run(x)
            np.asarray(out[:1, :1, :2, :2])
            print(f"[{label} {kind}] compile+first "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            if CPU:
                continue
            dt = device_time(lambda: run(x), n=3)
            flops = 2 * macs_per_inpix(nf, depth) * B * 3 * H * W
            peak = PEAK_BF16 if kind == "bf16" else PEAK_I8
            print(f"[{label} {kind}] {dt * 1e3:.1f} ms/batch  "
                  f"{out_px / dt / 1e6:.1f} MPix/s out  "
                  f"MFU {flops / dt / peak * 100:.1f}% of "
                  f"{'bf16' if kind == 'bf16' else 'int8'} peak", flush=True)
        except Exception as e:
            print(f"[{label} {kind}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

# --- quality: short synthetic train, deploy four ways -------------------
ITERS = (int(sys.argv[sys.argv.index("--iters") + 1])
         if "--iters" in sys.argv else (0 if CPU else 1500))
if ITERS:
    from mulut_tpu.data.benchmark import SRBenchmark
    from mulut_tpu.data.provider import Provider
    from mulut_tpu.data.synthetic import create_synthetic_dataset
    from mulut_tpu.pipelines.train import make_optimizer, make_train_step
    from mulut_tpu.utils.metrics import psnr, rgb2ycbcr

    DATA = "/tmp/q_data"
    if not os.path.isdir(os.path.join(DATA, "DIV2K")):
        print("building synthetic dataset...", flush=True)
        create_synthetic_dataset(DATA, n_train=24, n_val=2, size=480)
    valid = SRBenchmark(os.path.join(DATA, "SRBenchmark"), scale=scale)

    nf, depth = 128, 2
    params = init_srnets(jax.random.PRNGKey(1), nf=nf, scale=scale,
                         modes=modes, stages=stages, arch="mxu", depth=depth)
    optimizer = make_optimizer(1e-3, 1e-4, ITERS)
    state = optimizer.init(params)
    step = make_train_step(optimizer, modes=modes, stages=stages,
                           scale=scale)
    prov = Provider(32, 1, scale, os.path.join(DATA, "DIV2K"), 48)
    t0 = time.perf_counter()
    loss = None
    for i in range(ITERS):
        im, lb = prov.next()
        params, state, loss = step(params, state, jnp.asarray(im),
                                   jnp.asarray(lb))
    jax.block_until_ready(loss)
    print(f"trained {ITERS} iters in {time.perf_counter() - t0:.0f}s",
          flush=True)

    def val_with(run_fn, tag):
        vals = []
        for name, lr_i, hr_i in valid.pairs("Set5"):
            xv = jnp.asarray(
                lr_i.astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
            out = np.asarray(run_fn(xv))[0].transpose(1, 2, 0)
            out = np.round(np.clip(out, 0, 255)).astype(np.uint8)
            vals.append(psnr(rgb2ycbcr(out)[:, :, 0],
                             rgb2ycbcr(hr_i)[:, :, 0], scale))
        print(f"[quality {tag}] Set5-synth PSNR {np.mean(vals):.3f}",
              flush=True)

    f32 = jax.jit(lambda xv: srnets_predict(
        params, xv, modes=modes, stages=stages, scale=scale, phase="valid"))
    val_with(f32, "f32")
    bfp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    stb = stack_srnets_for_fast(bfp, modes=modes, stages=stages, scale=scale)
    val_with(jax.jit(lambda xv: srnets_predict_fast(
        stb, xv, modes=modes, stages=stages, scale=scale,
        interpret=CPU)), "bf16-kernel")
    for kind in ("f32", "int"):
        stq = quantize_srnets_for_fast(params, modes=modes, stages=stages,
                                       scale=scale, requant=kind)
        val_with(jax.jit(lambda xv: srnets_predict_fast(
            stq, xv, modes=modes, stages=stages, scale=scale,
            interpret=CPU)), f"w8a8-{kind}")
