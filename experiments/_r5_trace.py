"""r5: trace the window/rs deployment program + full byte-readback parity.

(a) per-op device breakdown of the fused YUV mxu-d2 program under the
    r5 defaults (window kernel, rs schedule, T=2048) — what stands
    between 19 ms and the 16.6 ms (1 GPix/s) bar.
(b) VERDICT r4 Next #6: one FULL byte-readback parity run for the
    kernel-layout change (window/rs vs tap-matrix/pass) at the bench
    shape — not checksums.

Run:  python experiments/_r5_trace.py [--skip-trace] [--skip-parity]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mulut_tpu.utils import lab


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-trace", action="store_true")
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--depth", type=int, default=2)
    args = p.parse_args()

    lab.setup()
    import jax
    import jax.numpy as jnp

    import mulut_tpu.models.srnet as sn
    import mulut_tpu.ops.unit_kernel as uk
    from mulut_tpu.models.srnet import init_srnets
    from mulut_tpu.pipelines.evaluate import NetEvaluator
    from mulut_tpu.utils.profiling import device_timeline, op_breakdown, trace

    B, H, W = 8, 270, 480
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    params = init_srnets(jax.random.PRNGKey(0), nf=args.nf, scale=4,
                         modes="sdy", stages=2, arch="mxu",
                         depth=args.depth)

    def build():
        ev = NetEvaluator(params, stages=2, modes="sdy", scale=4, fast=True)
        ev._build_yuv()
        return ev

    x = jnp.asarray(rgb)

    if not args.skip_trace:
        ev = build()
        ev._yuv_run(x)  # compile+warm
        tdir = "/tmp/r5_trace"
        with trace(tdir):
            for _ in range(3):
                out = ev._yuv_run(x)
            np.asarray(out[:1, :1, :1])
        for ms, op, long in op_breakdown(tdir, top=30):
            print(f"{ms / 3:8.2f} ms  {op:40s} {long[:70]}", flush=True)
        tl = device_timeline(tdir)
        print({k: (round(v / 3, 1) if isinstance(v, float) else v)
               for k, v in tl.items() if k != "gaps"}, flush=True)

    if not args.skip_parity:
        ev = build()
        a = np.asarray(ev._yuv_run(x))  # window/rs (defaults)
        sn.PLAIN_WINDOW = False
        uk.PLAIN_T_SCHEDULE = "pass"
        uk.stage_ensemble_apply_t.clear_cache()
        uk.stage_ensemble_apply_w.clear_cache()
        try:
            ev2 = build()
            b = np.asarray(ev2._yuv_run(x))
        finally:
            sn.PLAIN_WINDOW = True
            uk.PLAIN_T_SCHEDULE = "rs"
            uk.stage_ensemble_apply_t.clear_cache()
            uk.stage_ensemble_apply_w.clear_cache()
        eq = np.array_equal(a, b)
        print(f"[parity] FULL byte readback window/rs vs tap-matrix/pass: "
              f"{'EQUAL' if eq else 'DIFFER'} "
              f"(shape {a.shape}, {a.nbytes/1e6:.0f} MB each)", flush=True)
        if not eq:
            d = (a.astype(np.int16) - b.astype(np.int16))
            print(f"[parity] max |diff| {np.abs(d).max()}, "
                  f"frac nonzero {(d != 0).mean():.2e}", flush=True)


if __name__ == "__main__":
    main()
