"""Step 3: STE fine-tuning of cached LUT entries (ref: sr/3_finetune_lut.py).

The int8 LUTs become float32 trainables driven by the differentiable simplex
cascade; Adam + cosine LR on DIV2K patches, PSNR/SSIM validation, int8
re-export.
"""

from __future__ import annotations

import functools
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Provider, SRBenchmark
from ..models.lut_model import (
    export_lut_weights,
    init_lut_weights_from_folder,
    lut_model_forward,
)
from ..utils.imgio import save_image
from ..utils.logging_utils import logger_info
from ..utils.lut_io import lut_filename, parse_stage_key
from ..utils.metrics import psnr, rgb2ycbcr, ssim
from .train import make_optimizer


def make_finetune_step(optimizer, *, modes: str, stages: int, upscale: int,
                       interval: int):
    @jax.jit
    def step(weights, opt_state, im, lb):
        im = im.astype(jnp.float32) / 255.0
        lb = lb.astype(jnp.float32) / 255.0

        def loss_fn(w):
            pred = lut_model_forward(w, im, modes=modes, stages=stages,
                                     upscale=upscale, interval=interval)
            return jnp.mean((pred - lb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(weights)
        updates, opt_state = optimizer.update(grads, opt_state, weights)
        import optax

        weights = optax.apply_updates(weights, updates)
        return weights, opt_state, loss

    return step


@functools.lru_cache(maxsize=None)
def _valid_fwd(modes: str, stages: int, upscale: int, interval: int):
    # weights as an ARGUMENT: a closure would re-trace every validation round
    @jax.jit
    def fwd(weights, x):
        return lut_model_forward(weights, x, modes=modes, stages=stages,
                                 upscale=upscale, interval=interval)

    return fwd


def valid_steps(weights, valid: SRBenchmark, opt, it: int, logger):
    """PSNR + SSIM validation (ref: sr/3_finetune_lut.py:23-65)."""
    datasets = ["Set5", "Set14"] if opt.debug else valid.datasets

    jfwd = _valid_fwd(opt.modes, opt.stages, opt.scale, opt.interval)
    fwd = lambda x: jfwd(weights, x)  # noqa: E731

    for dataset in datasets:
        if dataset not in valid.files:
            continue
        psnrs, ssims = [], []
        result_path = os.path.join(opt.valoutDir, dataset)
        os.makedirs(result_path, exist_ok=True)
        for name, lr, hr in valid.pairs(dataset):
            x = jnp.asarray(lr.astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
            pred = np.asarray(fwd(x))[0].transpose(1, 2, 0) * 255.0
            pred = np.round(np.clip(pred, 0, 255)).astype(np.uint8)
            left, right = rgb2ycbcr(pred)[:, :, 0], rgb2ycbcr(hr)[:, :, 0]
            psnrs.append(psnr(left, right, opt.scale))
            ssims.append(ssim(left, right))
            save_image(os.path.join(result_path, f"{name}_lutft.png"), pred)
        logger.info(
            "Iter {} | Dataset {} | AVG PSNR: {:02f}, AVG: SSIM: {:04f}".format(
                it, dataset, float(np.mean(psnrs)), float(np.mean(ssims))
            )
        )


def finetune(opt) -> dict:
    """Full step-3 CLI behavior.  Returns the fine-tuned float weights."""
    logger_name = "lutft"
    logger_info(logger_name, os.path.join(opt.expDir, logger_name + ".log"))
    logger = logging.getLogger(logger_name)

    weights = init_lut_weights_from_folder(
        opt.expDir, stages=opt.stages, modes=opt.modes, upscale=opt.scale,
        interval=opt.interval
    )
    if opt.startIter > 0:
        # Fixed resume (the reference's two-positional-arg torch.load never
        # worked, ref: sr/3_finetune_lut.py:98-104): restore the float LUT
        # weights; the optimizer state follows below once it exists.
        wpath = os.path.join(opt.expDir, f"LUTft_{opt.startIter:06d}.npz")
        flat = np.load(wpath)
        weights = {k: jnp.asarray(flat[k]) for k in flat.files}
        logger.info(f"Resumed LUT weights from {wpath}")

    n_dev = (min(opt.gpuNum, jax.device_count())
             if getattr(opt, "gpuNum", 1) > 1 else 1)
    mesh = None
    if n_dev > 1:
        from ..parallel.mesh import make_mesh, replicate_tree, shard_batch

        mesh = make_mesh(n_dev)

    optimizer = make_optimizer(opt.lr0, opt.lr1, opt.totalIter, opt.weightDecay)
    opt_state = optimizer.init(weights)
    if opt.startIter > 0:
        from ..models.torch_import import load_opt_state_npz

        opt_ckpt = os.path.join(opt.expDir, f"Opt_ft_{opt.startIter:06d}.npz")
        if os.path.exists(opt_ckpt):
            opt_state = load_opt_state_npz(opt_ckpt, opt_state)
            logger.info(f"Resumed optimizer state from {opt_ckpt}")
    if mesh is not None:
        weights = replicate_tree(mesh, weights)
        opt_state = replicate_tree(mesh, opt_state)
    step = make_finetune_step(optimizer, modes=opt.modes, stages=opt.stages,
                              upscale=opt.scale, interval=opt.interval)

    provider = Provider(opt.batchSize, opt.workerNum, opt.scale, opt.trainDir,
                        opt.cropSize)
    valid = SRBenchmark(opt.valDir, scale=opt.scale)

    # device-side loss accumulation, one sync per window (see train.py)
    l_accum = jnp.zeros(())
    dT, accum_samples = 0.0, 0
    window_start = time.time()
    for i in range(opt.startIter + 1, opt.totalIter + 1):
        st = time.time()
        im, lb = provider.next()
        if mesh is not None:
            im, lb = shard_batch(mesh, im, lb)
        else:
            im, lb = jnp.asarray(im), jnp.asarray(lb)
        dT += time.time() - st

        weights, opt_state, loss = step(weights, opt_state, im, lb)
        l_accum = l_accum + loss
        accum_samples += opt.batchSize

        if i % opt.displayStep == 0:
            avg_loss = float(l_accum) / opt.displayStep
            wall = time.time() - window_start
            logger.info(
                "{} | Iter:{:6d}, Sample:{:6d}, GPixel:{:.2e}, dT:{:.4f}, rT:{:.4f}".format(
                    opt.expDir, i, accum_samples, avg_loss,
                    dT / opt.displayStep,
                    (wall - dT) / opt.displayStep,
                )
            )
            l_accum = jnp.zeros(())
            dT = 0.0
            window_start = time.time()

        if i % opt.valStep == 0 or i == 1:
            valid_steps(weights, valid, opt, i, logger)

        if i % opt.saveStep == 0:
            from ..models.torch_import import save_opt_state_npz

            np.savez(
                os.path.join(opt.expDir, f"LUTft_{i:06d}.npz"),
                **{k: np.asarray(v) for k, v in weights.items()},
            )
            save_opt_state_npz(
                os.path.join(opt.expDir, f"Opt_ft_{i:06d}.npz"),
                jax.device_get(opt_state),
            )
            logger.info(f"Checkpoint saved {i}")

    provider.close()

    luts_i8 = export_lut_weights(weights)
    for key, arr in luts_i8.items():
        stage, mode = parse_stage_key(key)
        path = os.path.join(
            opt.expDir,
            lut_filename("LUT_ft", opt.scale, opt.interval, stage, mode),
        )
        np.save(path, arr)
    logger.info(f"Finetuned LUT saved to {opt.expDir}")
    logger.info("Complete")
    return weights
