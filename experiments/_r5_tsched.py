"""r5: schedule re-sweep for the FEATURE-major (transposed) kernel.

VERDICT r4 Next #2: the stage kernels sit at ~50% MFU against the d2 71%
cap.  The site-major schedule sweeps (rs/rsiv/ivg) were all negative in
r3, but the r4 transposed-layout lesson says closed levers re-open after
a structural change — and in the feature-major layout rotation stacking
is a LANE-axis concat (no row copies): one (nf, 4T) chain per mode, 3
dependent hidden chains per stage instead of 12.

Ladder: PLAIN_T_SCHEDULE (pass/rs/rsiv) x ENSEMBLE_TILE_T
(1024..8192; rs quadruples the effective matmul width, so its optimum
may sit below the pass-major 4096).  Deployment form: fused device YUV
pipeline, batch 8 x 480x270 -> 1080p RGB uint8 (replaces ref
sr/4_test_lut.py:257-316).  Parity: device row checksums vs pass/4096.

Run:  python experiments/_r5_tsched.py [--depth 2] [--nf 128] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mulut_tpu.utils import lab


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--schedules", nargs="+", default=["pass", "rs", "rsiv"])
    p.add_argument("--tiles", type=int, nargs="+",
                   default=[1024, 2048, 4096, 8192])
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    lab.setup()
    import jax
    import jax.numpy as jnp

    import mulut_tpu.ops.unit_kernel as uk
    from mulut_tpu.models.srnet import init_srnets
    from mulut_tpu.pipelines.evaluate import NetEvaluator

    B, H, W = (2, 40, 48) if args.cpu else (8, 270, 480)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    params = init_srnets(jax.random.PRNGKey(0), nf=args.nf, scale=4,
                         modes="sdy", stages=2, arch="mxu",
                         depth=args.depth)
    out_px = B * H * W * 16  # full-color output frame pixels (1080p x B)

    def build():
        ev = NetEvaluator(params, stages=2, modes="sdy", scale=4, fast=True)
        ev._build_yuv()
        return ev

    baseline = {}
    tile0 = uk.ENSEMBLE_TILE_T

    def run_one(cfg):
        sched, tile = cfg
        uk.PLAIN_T_SCHEDULE = sched
        uk.ENSEMBLE_TILE_T = tile
        uk.stage_ensemble_apply_t.clear_cache()
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
            uk.PLAIN_T_SCHEDULE = "pass"
            uk.ENSEMBLE_TILE_T = tile0
            uk.stage_ensemble_apply_t.clear_cache()

    cfgs = [(s, t) for s in args.schedules for t in args.tiles]
    base = ("pass", tile0)
    if base in cfgs:
        cfgs.remove(base)
    cfgs.insert(0, base)  # measured r4 winner first = checksum oracle
    lab.ladder(cfgs, run_one, label=lambda c: f"{c[0]}/T{c[1]}")


if __name__ == "__main__":
    main()
