"""R3: synthetic capacity-parity — dense-nf64 vs mxu units, same schedule.

No real DIV2K ships (zero egress), so full-scale quality parity is
unverifiable; this is the strongest testable statement: identical
synthetic data, schedule and seed, N iterations each, compare val PSNR
on the synthetic benchmark.  Also reports wall/iter per arch.

Usage: _r3_mxuq.py [--cpu] [--iters N] [--data DIR]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from mulut_tpu.data.benchmark import SRBenchmark
from mulut_tpu.data.provider import Provider
from mulut_tpu.data.synthetic import create_synthetic_dataset
from mulut_tpu.models.srnet import init_srnets, srnets_predict
from mulut_tpu.pipelines.train import make_optimizer, make_train_step
from mulut_tpu.utils.metrics import psnr, rgb2ycbcr

CPU = "--cpu" in sys.argv
ITERS = (int(sys.argv[sys.argv.index("--iters") + 1])
         if "--iters" in sys.argv else (20 if CPU else 3000))
DATA = (sys.argv[sys.argv.index("--data") + 1]
        if "--data" in sys.argv else "/tmp/mxuq_data")
scale, stages, modes = 4, 2, "sdy"
BATCH, CROP = (4, 8) if CPU else (32, 48)

if not os.path.isdir(os.path.join(DATA, "DIV2K")):
    print("building synthetic dataset...", flush=True)
    create_synthetic_dataset(
        DATA, n_train=4 if CPU else 24, n_val=2,
        size=48 if CPU else 480)

valid = SRBenchmark(os.path.join(DATA, "SRBenchmark"), scale=scale)


def val_psnr(params):
    fwd = jax.jit(lambda p, x: srnets_predict(
        p, x, modes=modes, stages=stages, scale=scale, phase="valid"))
    vals = []
    for name, lr, hr in valid.pairs("Set5"):
        x = jnp.asarray(lr.astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
        pred = np.asarray(fwd(params, x))[0].transpose(1, 2, 0)
        pred = np.round(np.clip(pred, 0, 255)).astype(np.uint8)
        vals.append(psnr(rgb2ycbcr(pred)[:, :, 0],
                         rgb2ycbcr(hr)[:, :, 0], scale))
    return float(np.mean(vals))


for label, arch, nf, depth in (
    ("dense-nf64", "dense", 64, None),
    ("mxu-nf128-d2", "mxu", 128, 2),
    ("mxu-nf128-d3", "mxu", 128, 3),
):
    if CPU and depth == 3:
        continue
    params = init_srnets(jax.random.PRNGKey(0), nf=nf, scale=scale,
                         modes=modes, stages=stages, arch=arch, depth=depth)
    optimizer = make_optimizer(1e-3, 1e-4, ITERS)
    opt_state = optimizer.init(params)
    step = make_train_step(optimizer, modes=modes, stages=stages, scale=scale)
    provider = Provider(BATCH, 1, scale, os.path.join(DATA, "DIV2K"), CROP)
    t0 = time.perf_counter()
    loss = None
    for it in range(ITERS):
        im, lb = provider.next()
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(im), jnp.asarray(lb))
        if it == 0:
            jax.block_until_ready(loss)
            t0 = time.perf_counter()  # exclude compile
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / max(ITERS - 1, 1)
    p = val_psnr(params)
    print(f"[{label}] {ITERS} iters, {dt * 1e3:.1f} ms/iter, "
          f"final loss {float(loss):.5f}, synthetic-Set5 PSNR {p:.3f} dB",
          flush=True)
