"""r5: quality + fine-tune sweep for the window/rs deployment config.

(a) Set5 quality of the shipped distilled artifacts through the window
    kernel (RGB path and device-YUV path) vs the tap-matrix kernel —
    the scattered K=25 head changes head-sum association, so quality is
    the acceptance criterion (checksums already matched at the bench
    shape on noise input).
(b) fine window-tile sweep (rs schedule) at n=8 timing reps.

Run:  python experiments/_r5_wq.py [--skip-quality] [--skip-sweep]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "sr"))

import numpy as np

from mulut_tpu.utils import lab

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "artifacts")
BENCH = "/root/reference/data/SRBenchmark"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-quality", action="store_true")
    p.add_argument("--skip-sweep", action="store_true")
    p.add_argument("--tiles", type=int, nargs="+",
                   default=[1536, 2048, 3072])
    p.add_argument("--artifact", default="mxu_distilled_x4sdy_nf128_d2_ftr2.npz")
    args = p.parse_args()

    lab.setup()
    import jax
    import jax.numpy as jnp

    import mulut_tpu.models.srnet as sn
    import mulut_tpu.ops.unit_kernel as uk
    from Test import run_benchmark

    from mulut_tpu.models.torch_import import load_params_npz
    from mulut_tpu.pipelines.evaluate import NetEvaluator

    params = load_params_npz(os.path.join(ART, args.artifact))

    def clear():
        uk.stage_ensemble_apply_t.clear_cache()
        uk.stage_ensemble_apply_w.clear_cache()

    results = {}
    if not args.skip_quality:
        for label, win, sched in (("mat/pass", False, "pass"),
                                  ("win/rs", True, "rs")):
            sn.PLAIN_WINDOW = win
            uk.PLAIN_T_SCHEDULE = sched
            clear()
            try:
                ev = NetEvaluator(params, stages=2, modes="sdy", scale=4,
                                  fast=True)
                print(f"== {label} RGB path ==", flush=True)
                results[label + "/rgb"] = run_benchmark(ev, BENCH, ["Set5"])
                print(f"== {label} device-YUV path ==", flush=True)
                results[label + "/yuv"] = run_benchmark(
                    ev, BENCH, ["Set5"], device_yuv=True)
            finally:
                sn.PLAIN_WINDOW = False
                uk.PLAIN_T_SCHEDULE = "pass"
                clear()

    if not args.skip_sweep:
        rng = np.random.default_rng(0)
        B, H, W = 8, 270, 480
        rgb = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
        out_px = B * H * W * 16
        init = __import__("mulut_tpu.models.srnet", fromlist=["init_srnets"])
        p0 = init.init_srnets(jax.random.PRNGKey(0), nf=128, scale=4,
                              modes="sdy", stages=2, arch="mxu", depth=2)
        wtile0 = uk.WINDOW_TILE_T

        def run_one(tile):
            sn.PLAIN_WINDOW = True
            uk.PLAIN_T_SCHEDULE = "rs"
            uk.WINDOW_TILE_T = tile
            clear()
            try:
                ev = NetEvaluator(p0, stages=2, modes="sdy", scale=4,
                                  fast=True)
                ev._build_yuv()
                x = jnp.asarray(rgb)
                ev._yuv_run(x)
                dt = lab.device_time(lambda: ev._yuv_run(x), n=8)
                return {"ms": round(dt * 1e3, 2),
                        "MPix/s": round(out_px / dt / 1e6, 1)}
            finally:
                sn.PLAIN_WINDOW = False
                uk.PLAIN_T_SCHEDULE = "pass"
                uk.WINDOW_TILE_T = wtile0
                clear()

        lab.ladder(args.tiles, run_one, label=lambda t: f"win/rs/T{t}")

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
