"""r4: MXU-head throughput across deployment forms + dense-arch quality.

After the PLAIN_HEAD="mxu" flip (chip A/B in _r4_yuv.py: fused YUV mxu-d2
44.8 -> 35.3 ms), re-measure every headline form with the new head — RGB
and fused-YUV, mxu-d2/d3 and the dense reference shapes (the dense
pass-major and pair kernels share the head helper) — plus dense-arch Set5
quality through the fast path.

Run:  python experiments/_r4_head2.py [--quality]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "sr"))

import numpy as np

from mulut_tpu.utils import lab

CKPT = "/root/reference/models/sr_x2sdy/Model_200000.pth"
BENCH = "/root/reference/data/SRBenchmark"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quality", action="store_true",
                   help="also run dense-arch Set5 through the fast path")
    args = p.parse_args()

    lab.setup()
    import jax
    import jax.numpy as jnp

    from mulut_tpu.models.srnet import init_srnets
    from mulut_tpu.pipelines.evaluate import NetEvaluator

    B, H, W, scale = 8, 270, 480, 4
    rng = np.random.default_rng(0)
    rgb_u8 = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    x_rgb = jnp.asarray(
        rgb_u8.astype(np.float32).transpose(0, 3, 1, 2) / 255.0)
    frame_px = B * H * W * scale * scale            # full-color frame out
    plane_px3 = frame_px * 3                        # RGB channel-plane out

    def build(arch, depth):
        params = init_srnets(jax.random.PRNGKey(0), nf=128 if arch == "mxu"
                             else 64, scale=scale, modes="sdy", stages=2,
                             arch=arch, depth=depth)
        ev = NetEvaluator(params, stages=2, modes="sdy", scale=scale,
                          fast=True)
        ev._build_yuv()
        return ev

    def run_one(cfg):
        arch, depth, form = cfg
        ev = build(arch, depth)
        if form == "rgb":
            fn = lambda: ev._run(x_rgb)  # noqa: E731
            px = plane_px3
        else:
            xj = jnp.asarray(rgb_u8)
            fn = lambda: ev._yuv_run(xj)  # noqa: E731
            px = frame_px
        fn()
        dt = lab.device_time(fn, n=4)
        return {"ms": round(dt * 1e3, 1),
                "MPix/s": round(px / dt / 1e6, 1),
                "unit": "RGB-plane" if form == "rgb" else "full-color"}

    cfgs = [("mxu", 2, "yuv"), ("mxu", 2, "rgb"),
            ("mxu", 3, "yuv"), ("mxu", 3, "rgb"),
            ("dense", None, "yuv"), ("dense", None, "rgb")]
    lab.ladder(cfgs, run_one,
               label=lambda c: f"{c[0]}{'-d' + str(c[1]) if c[1] else ''}/{c[2]}")

    if args.quality:
        from Test import run_benchmark

        from mulut_tpu.models.torch_import import srnets_params_from_torch

        dense = srnets_params_from_torch(CKPT, modes="sdy", stages=2)
        ev = NetEvaluator(dense, stages=2, modes="sdy", scale=4, fast=True)
        print("== dense ckpt, fast path, PLAIN_HEAD=mxu ==", flush=True)
        run_benchmark(ev, BENCH, ["Set5"])


if __name__ == "__main__":
    main()
