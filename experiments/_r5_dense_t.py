"""r5: feature-major (transposed) layout A/B for the DENSE kernels.

VERDICT r4 Next #4: the dense kernels kept the VPU head + site-major
layout because the site-major MXU-head/tile variants compile-OOM'd
scoped VMEM — but the transposed form shrinks exactly those buffers
(concat (5nf, T) instead of (T, 5nf) + per-layer (nf, T) f32), and on
the plain kernels the layout flip was the single biggest r4 win.
Outputs are bit-identical (same VPU head / accumulation order;
CPU-verified in tests/test_mxu_arch.py).

Ladder: DENSE_LAYOUT (site/feature) x ENSEMBLE_TILE (512..2048; the
transposed dense scratch is 5nf x T bf16 = 0.64 MB/1024 at nf=64).
Deployment form: fused device YUV pipeline, batch 8 x 480x270 -> 1080p
(the 30.59-quality row, PERF.md "fused YUV dense").

Run:  python experiments/_r5_dense_t.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mulut_tpu.utils import lab


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nf", type=int, default=64)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--layouts", nargs="+",
                   default=["site", "feature", "featwin"])
    p.add_argument("--tiles", type=int, nargs="+",
                   default=[1024, 2048, 4096])
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    lab.setup()
    import jax
    import jax.numpy as jnp

    import mulut_tpu.models.srnet as sn
    import mulut_tpu.ops.unit_kernel as uk
    from mulut_tpu.models.srnet import init_srnets
    from mulut_tpu.pipelines.evaluate import NetEvaluator

    B, H, W = (2, 40, 48) if args.cpu else (8, 270, 480)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    params = init_srnets(jax.random.PRNGKey(0), nf=args.nf, scale=4,
                         modes="sdy", stages=2, arch="dense")
    out_px = B * H * W * 16

    def build():
        ev = NetEvaluator(params, stages=2, modes="sdy", scale=4, fast=True)
        ev._build_yuv()
        return ev

    baseline = {}
    tile0, wtile0 = uk.ENSEMBLE_TILE, uk.WINDOW_TILE_T

    def run_one(cfg):
        layout, tile = cfg
        # "site" = r3 site-major kernel; "feature" = _dense_t_kernel
        # (tap-matrix); "featwin" = _dense_w_kernel (window extraction).
        # All three bit-identical (CPU-verified).
        sn.DENSE_LAYOUT = "feature" if layout == "featwin" else layout
        sn.PLAIN_WINDOW = layout == "featwin"
        uk.ENSEMBLE_TILE = tile
        uk.WINDOW_TILE_T = tile
        uk.stage_ensemble_apply.clear_cache()
        uk.stage_ensemble_apply_t.clear_cache()
        uk.stage_ensemble_apply_w.clear_cache()
        try:
            ev = build()
            x = jnp.asarray(rgb)
            out = ev._yuv_run(x)
            ck = lab.row_checksums(out.reshape(out.shape[0], -1))
            if "ck" not in baseline:
                baseline["ck"] = ck
            parity = lab.checksum_match(ck, baseline["ck"])
            if args.cpu:
                return {"parity": parity}
            dt = lab.device_time(lambda: ev._yuv_run(x), n=4)
            return {"ms": round(dt * 1e3, 1),
                    "MPix/s": round(out_px / dt / 1e6, 1),
                    "parity": "MATCH" if parity else "MISMATCH"}
        finally:
            sn.DENSE_LAYOUT = "site"
            sn.PLAIN_WINDOW = True
            uk.ENSEMBLE_TILE = tile0
            uk.WINDOW_TILE_T = wtile0
            uk.stage_ensemble_apply.clear_cache()
            uk.stage_ensemble_apply_t.clear_cache()
            uk.stage_ensemble_apply_w.clear_cache()

    cfgs = [(lo, t) for lo in args.layouts for t in args.tiles]
    base = ("site", tile0)
    if base in cfgs:
        cfgs.remove(base)
    cfgs.insert(0, base)
    lab.ladder(cfgs, run_one, label=lambda c: f"{c[0]}/T{c[1]}")


if __name__ == "__main__":
    main()
