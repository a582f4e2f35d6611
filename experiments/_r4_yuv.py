"""r4: attack the mxu-d2 MFU gap — trace + schedule/tile ladder (fused YUV).

VERDICT r3 Next #2: the only remaining road toward the >1 GPix/s north
star is the net-mode path (mxu-d2: 19.5% MFU vs a 71% cap; fused YUV
357.6 full-color MPix/s, target >=500).  r3 closed the within-stage
schedule space for pass-major/iv/rs/rsiv; the un-attacked levers measured
here, all on the DEPLOYMENT form (fused device YUV pipeline, batch 8 x
480x270 -> 1080p RGB uint8):

  * `--trace`: full per-op breakdown of the fused YUV program — how much
    is stage kernels vs tap/interleave/chroma/color glue (facts before
    kernels).
  * ladder over ENSEMBLE_TILE (1024/2048/4096: per-matmul fixed cost
    amortization on the latency-bound d2 chain — r3 swept tiles only on
    the DENSE kernel) x PLAIN_SCHEDULE (pass, ivg2/3/4: group-of-G
    interleave keeps G live chains — between pass-major's drains and the
    measured-slower full 12-way interleave).

Parity: device-side checksums per config vs the pass/1024 baseline
(lab.row_checksums; full readbacks stall through a degraded tunnel).

Run:  python experiments/_r4_yuv.py [--trace] [--depth 2] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mulut_tpu.utils import lab


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", action="store_true")
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--schedules", nargs="+",
                   default=["pass", "ivg2", "ivg3", "ivg4"])
    p.add_argument("--tiles", type=int, nargs="+", default=[1024, 2048, 4096])
    p.add_argument("--heads", nargs="+", default=["vpu"],
                   help="PLAIN_HEAD values to ladder (vpu, mxu)")
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
    from mulut_tpu.utils.profiling import device_timeline, op_breakdown, trace

    B, H, W = (2, 40, 48) if args.cpu else (8, 270, 480)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    params = init_srnets(jax.random.PRNGKey(0), nf=args.nf, scale=4,
                         modes="sdy", stages=2, arch="mxu",
                         depth=args.depth)
    out_px = B * H * W * 16 * 3  # full-color frame pixels out

    def build():
        ev = NetEvaluator(params, stages=2, modes="sdy", scale=4, fast=True)
        ev._build_yuv()
        return ev

    if args.trace:
        ev = build()
        x = jnp.asarray(rgb)
        ev._yuv_run(x)  # compile+warm
        tdir = "/tmp/r4_yuv_trace"
        with trace(tdir):
            for _ in range(3):
                out = ev._yuv_run(x)
            np.asarray(out[:1, :1, :1])
        for ms, op, long in op_breakdown(tdir, top=28):
            print(f"{ms / 3:8.2f} ms  {op:40s} {long[:70]}", flush=True)
        tl = device_timeline(tdir)
        print({k: (round(v / 3, 1) if isinstance(v, float) else v)
               for k, v in tl.items() if k != "gaps"}, flush=True)
        return

    baseline = {}

    def run_one(cfg):
        sched, tile, head = cfg
        uk.PLAIN_SCHEDULE = sched
        uk.ENSEMBLE_TILE = tile
        uk.PLAIN_HEAD = head
        uk.stage_ensemble_apply.clear_cache()
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
            uk.PLAIN_SCHEDULE = "pass"
            uk.ENSEMBLE_TILE = 1024
            uk.PLAIN_HEAD = "vpu"
            uk.stage_ensemble_apply.clear_cache()

    cfgs = [(s, t, h) for h in args.heads for t in args.tiles
            for s in args.schedules]
    # baseline first so every checksum compares against pass/1024/vpu.
    # NOTE: the mxu head is NOT bit-identical to the vpu head (f32 MXU
    # tree vs sequential bf16 sum) — expect checksum MISMATCH there and
    # judge it by quality (Set5), not parity.
    base = ("pass", 1024, "vpu")
    if base in cfgs:
        cfgs.remove(base)
    cfgs.insert(0, base)
    lab.ladder(cfgs, run_one, label=lambda c: f"{c[0]}/T{c[1]}/{c[2]}")


if __name__ == "__main__":
    main()
