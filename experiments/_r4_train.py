"""r4: bf16 mixed-precision training for the mxu arch (VERDICT r3 #7).

The mxu units train 2.6-3.2x slower per iter than dense on the
f32-HIGHEST path (PERF.md) — 3-pass matmul emulation on wider shapes.
--trainPrecision bf16 (pipelines/train.make_train_step precision="bf16")
keeps f32 masters/Adam and runs the cascade forward/backward in bfloat16.
This script measures ms/iter at the reference shape (batch 32, crop 48)
for dense-f32 / mxu-f32 / mxu-bf16 and runs the synthetic quality-parity
gate (identical data/schedule/seed, N iters, synthetic val PSNR —
the _r3_mxuq.py harness with a precision axis).

Target (VERDICT): mxu bf16 <= 1.5x dense f32 ms/iter with matched
synthetic val PSNR.

Run:  python experiments/_r4_train.py [--iters 3000] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mulut_tpu.utils import lab


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--data", default="/tmp/mxuq_data")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.iters = min(args.iters, 20)
    lab.setup()
    import jax
    import jax.numpy as jnp

    from mulut_tpu.data.benchmark import SRBenchmark
    from mulut_tpu.data.provider import Provider
    from mulut_tpu.data.synthetic import create_synthetic_dataset
    from mulut_tpu.models.srnet import init_srnets, srnets_predict
    from mulut_tpu.pipelines.train import make_optimizer, make_train_step
    from mulut_tpu.utils.metrics import psnr, rgb2ycbcr

    scale, stages, modes = 4, 2, "sdy"
    batch, crop = (4, 8) if args.cpu else (32, 48)
    if not os.path.isdir(os.path.join(args.data, "DIV2K")):
        print("building synthetic dataset...", flush=True)
        create_synthetic_dataset(args.data, n_train=4 if args.cpu else 24,
                                 n_val=2, size=48 if args.cpu else 480)
    valid = SRBenchmark(os.path.join(args.data, "SRBenchmark"), scale=scale)

    def val_psnr(params):
        fwd = jax.jit(lambda p, x: srnets_predict(
            p, x, modes=modes, stages=stages, scale=scale, phase="valid"))
        vals = []
        for name, lr, hr in valid.pairs("Set5"):
            x = jnp.asarray(
                lr.astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
            pred = np.asarray(fwd(params, x))[0].transpose(1, 2, 0)
            pred = np.round(np.clip(pred, 0, 255)).astype(np.uint8)
            vals.append(psnr(rgb2ycbcr(pred)[:, :, 0],
                             rgb2ycbcr(hr)[:, :, 0], scale))
        return float(np.mean(vals))

    def run_one(cfg):
        label, arch, nf, depth, prec = cfg
        params = init_srnets(jax.random.PRNGKey(0), nf=nf, scale=scale,
                             modes=modes, stages=stages, arch=arch,
                             depth=depth)
        optimizer = make_optimizer(1e-3, 1e-4, args.iters)
        opt_state = optimizer.init(params)
        step = make_train_step(optimizer, modes=modes, stages=stages,
                               scale=scale, precision=prec)
        provider = Provider(batch, 1, scale, os.path.join(args.data, "DIV2K"),
                            crop)
        t0 = time.perf_counter()
        loss = None
        for it in range(args.iters):
            im, lb = provider.next()
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(im), jnp.asarray(lb))
            if it == 0:
                jax.block_until_ready(loss)
                t0 = time.perf_counter()  # exclude compile
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / max(args.iters - 1, 1)
        provider.close()
        return {"ms/iter": round(dt * 1e3, 1),
                "val_psnr": round(val_psnr(params), 3)}

    cfgs = [
        ("dense-f32", "dense", 64, None, "f32"),
        ("mxu-d2-f32", "mxu", 128, 2, "f32"),
        ("mxu-d2-bf16", "mxu", 128, 2, "bf16"),
        ("mxu-d3-bf16", "mxu", 128, 3, "bf16"),
    ]
    lab.ladder(cfgs, run_one, label=lambda c: c[0])


if __name__ == "__main__":
    main()
