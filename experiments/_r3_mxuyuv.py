"""R3: the >1 GPix/s claim — mxu-arch net + fused device YUV pipeline.

Times `NetEvaluator.upscale_yuv_batch`'s jitted program (RGB->YCbCr,
1-channel luma cascade through the plain-MLP stage-ensemble kernel,
chroma bicubic matmuls, YCbCr->RGB, uint8 out) with mxu-nf128-d2 units
vs the reference dense-nf64 arch.  Random weights — throughput is
weight-independent.

Usage: _r3_mxuyuv.py [--cpu]
"""
import sys
import time

import numpy as np
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from mulut_tpu.models.srnet import init_srnets
from mulut_tpu.pipelines.evaluate import NetEvaluator
from mulut_tpu.utils.profiling import device_time


def main():
    cpu = "--cpu" in sys.argv
    H, W, B = (24, 32, 1) if cpu else (270, 480, 8)
    scale = 4
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, H, W, 3), dtype=np.int64).astype(np.uint8)

    for label, arch, nf, depth in (
        ("dense-nf64", "dense", 64, None),
        ("mxu-nf128-d2", "mxu", 128, 2),
    ):
        params = init_srnets(jax.random.PRNGKey(0), nf=nf, scale=scale,
                             modes="sdy", stages=2, arch=arch, depth=depth)
        ev = NetEvaluator(params, stages=2, modes="sdy", scale=scale,
                          fast=not cpu)
        t0 = time.perf_counter()
        out = ev.upscale_yuv_batch(imgs)
        print(f"[{label}-yuv] compile+run {time.perf_counter() - t0:.0f}s "
              f"out {out.shape} {out.dtype}", flush=True)
        if cpu:
            assert out.shape == (B, H * scale, W * scale, 3)
            continue
        run = ev._yuv_run
        dev = jax.device_put(imgs)
        dt = device_time(lambda: run(dev), n=4)
        eff = B * H * W * scale * scale / 1e6 / dt
        print(f"[{label}-yuv] device {dt * 1e3:.1f} ms/batch -> "
              f"{eff:.1f} full-color output MPix/s", flush=True)


main()
