"""r5: window kernel (in-kernel tap extraction) A/B — VERDICT r4 Next #1.

Compares the fused-YUV deployment program with PLAIN_WINDOW on/off
(x PLAIN_T_SCHEDULE pass/rs, x tile): window mode deletes the XLA
(48, N) tap-matrix build and drops per-stage kernel HBM reads ~100 MB ->
~6 MB (flat windows with a +/-(P*Wp+P) halo; taps = static lane slices
in-kernel, deduplicated to 25 shifts through scattered K=25 heads).

Parity note: the scattered head changes the head-sum association (like
PLAIN_HEAD="mxu" did), so judge checksum MISMATCHes by quality, not
bitwise — though CPU interpret measured bit-equal on random inputs.

Run:  python experiments/_r5_window.py [--cpu]
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
    p.add_argument("--configs", nargs="+",
                   default=["mat/pass/4096", "mat/rs/1024",
                            "win/pass/4096", "win/rs/1024",
                            "win/rs/2048", "win/rs/4096"])
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
                         modes="sdy", stages=2, arch="mxu",
                         depth=args.depth)
    out_px = B * H * W * 16

    def build():
        ev = NetEvaluator(params, stages=2, modes="sdy", scale=4, fast=True)
        ev._build_yuv()
        return ev

    baseline = {}
    tile0, wtile0 = uk.ENSEMBLE_TILE_T, uk.WINDOW_TILE_T

    def clear():
        uk.stage_ensemble_apply_t.clear_cache()
        uk.stage_ensemble_apply_w.clear_cache()

    def run_one(cfg):
        src, sched, tile = cfg.split("/")
        sn.PLAIN_WINDOW = src == "win"
        uk.PLAIN_T_SCHEDULE = sched
        if src == "win":
            uk.WINDOW_TILE_T = int(tile)
        else:
            uk.ENSEMBLE_TILE_T = int(tile)
        clear()
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
            sn.PLAIN_WINDOW = False
            uk.PLAIN_T_SCHEDULE = "pass"
            uk.ENSEMBLE_TILE_T = tile0
            uk.WINDOW_TILE_T = wtile0
            clear()

    lab.ladder(args.configs, run_one)


if __name__ == "__main__":
    main()
