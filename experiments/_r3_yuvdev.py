"""R3: time the FUSED device YUV pipelines at the bench shape.

The _r3_yuv.py estimate times a bare 1-channel cascade; this times the
real end-to-end programs (`LutEvaluator.upscale_yuv_batch` /
`NetEvaluator.upscale_yuv_batch`): RGB->YCbCr, luma cascade, chroma
bicubic matmuls, YCbCr->RGB, uint8 out — the numbers PERF.md/README can
quote for the YUV deployment mode.

Usage: _r3_yuvdev.py [--cpu] [--b N] [--net]
"""
import sys
import time

import numpy as np
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from mulut_tpu.pipelines.evaluate import LutEvaluator, NetEvaluator
from mulut_tpu.utils.profiling import device_time

REF = "/root/reference/models/sr_x2sdy"


def main():
    cpu = "--cpu" in sys.argv
    H, W = (24, 32) if cpu else (270, 480)
    B = (int(sys.argv[sys.argv.index("--b") + 1])
         if "--b" in sys.argv else (1 if cpu else 8))
    scale = 4
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (B, H, W, 3), dtype=np.int64).astype(np.uint8)

    evs = [("lut", LutEvaluator.from_folder(REF, stages=2, modes="sdy",
                                            scale=scale))]
    if "--net" in sys.argv or not cpu:
        evs.append(("net", NetEvaluator.from_checkpoint(
            f"{REF}/Model_200000.pth", stages=2, modes="sdy", scale=scale,
            fast=not cpu)))

    for name, ev in evs:
        t0 = time.perf_counter()
        out = ev.upscale_yuv_batch(imgs)
        print(f"[{name}-yuv] compile+run {time.perf_counter()-t0:.0f}s "
              f"out {out.shape} {out.dtype}", flush=True)
        if cpu:
            continue
        # device_time needs the jitted program handle (upscale_yuv_batch
        # pulls the full uint8 output to host; that transfer is part of
        # the honest end-to-end wall, so time BOTH)
        run = ev._yuv_run
        dev = jax.device_put(imgs)
        dt = device_time(lambda: run(dev), n=4)
        eff = B * H * W * scale * scale / 1e6 / dt
        print(f"[{name}-yuv] device {dt*1e3:.1f} ms/batch -> "
              f"{eff:.1f} full-color output MPix/s", flush=True)
        k = 4
        t0 = time.perf_counter()
        for _ in range(k):
            ev.upscale_yuv_batch(imgs)
        wall = (time.perf_counter() - t0) / k
        print(f"[{name}-yuv] end-to-end {wall*1e3:.1f} ms/batch "
              f"(incl. H2D/D2H) -> {B*H*W*scale*scale/1e6/wall:.1f} MPix/s",
              flush=True)


if __name__ == "__main__":
    main()
