"""Step 1: train the MuLUT network (ref: sr/1_train_model.py).

TPU-native training loop: one jitted train step (forward cascade + MSE +
Adam), data parallelism via a 1-D device mesh with the batch axis sharded
(replacing torch DataParallel, ref: sr/1_train_model.py:141-142) — jit
inserts the gradient all-reduce over ICI.  The cosine LR schedule, STE
rounding, loss and log formats match the reference.
"""

from __future__ import annotations

import functools
import logging
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import Provider, SRBenchmark
from ..models.srnet import init_srnets, srnets_predict
from ..models.torch_import import (
    load_opt_state_npz,
    load_params_npz,
    save_opt_state_npz,
    save_params_npz,
)
from ..parallel.mesh import make_mesh, replicate_tree, shard_batch
from ..utils.imgio import save_image
from ..utils.logging_utils import logger_info
from ..utils.metrics import psnr, rgb2ycbcr


def cosine_lr(lr0: float, lr1: float, total_iter: int):
    """The reference's cosine schedule (ref: sr/1_train_model.py:149-155)."""
    if lr1 < 0:
        lr_a, lr_b = 0.8, 0.2
    else:
        lr_b = lr1 / lr0
        lr_a = 1 - lr_b

    def schedule(step):
        cos = (1 + jnp.cos(step * math.pi / total_iter)) / 2
        return lr0 * (cos * lr_a + lr_b)

    return schedule


def make_optimizer(lr0: float, lr1: float, total_iter: int, weight_decay: float = 0.0):
    """Adam(0.9, 0.999, eps 1e-8) + cosine LR (ref: sr/1_train_model.py:146)."""
    sched = cosine_lr(lr0, lr1, total_iter)
    if weight_decay > 0:
        return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=weight_decay)
    return optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)


def make_train_step(optimizer, *, modes: str, stages: int, scale: int,
                    precision: str = "f32"):
    """One jitted training step.

    precision='bf16' is the mixed-precision mode for the mxu arch
    (VERDICT r3 #7): every tensor (params, activations, STE rounds,
    loss, grads, Adam state) stays float32 — only the MXU matmuls run at
    DEFAULT precision (single-pass bf16 inputs) instead of HIGHEST
    (3-pass f32-accurate emulation), which is where the mxu units'
    train-time premium over dense comes from.  An earlier all-bf16-cast
    scheme was chip-measured NEGATIVE on both axes (42.7 ms/iter vs
    f32's 29.9 AND -3.9 dB synthetic val — bf16 activations interact
    badly with the 127-scaled STE rounds); keeping elementwise math f32
    and trimming only matmul input mantissas is the surgical form.
    """
    fast_mm = precision == "bf16"
    mm_precision = (jax.lax.Precision.DEFAULT if fast_mm
                    else jax.lax.Precision.HIGHEST)

    @jax.jit
    def step(params, opt_state, im, lb):
        # batches arrive uint8; normalize on device (4x less H2D traffic)
        im = im.astype(jnp.float32) / 255.0
        lb = lb.astype(jnp.float32) / 255.0

        def loss_fn(p):
            pred = srnets_predict(p, im, modes=modes, stages=stages,
                                  scale=scale, phase="train",
                                  precision=mm_precision)
            return jnp.mean((pred - lb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_summary_writer(log_dir: str):
    """TensorBoard writer (ref: sr/1_train_model.py:127), or a no-op stub
    when torch's tensorboard backend is unavailable."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=log_dir)
    except Exception:  # noqa: BLE001 - observability must never break training
        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def flush(self):
                pass

            def close(self):
                pass

        return _Null()


@functools.lru_cache(maxsize=None)
def _valid_fwd(modes: str, stages: int, scale: int):
    # One jit cache per model config, with params as an ARGUMENT: a closure
    # capturing params would re-trace every validation round (per image
    # shape, every valStep of a 200k-iter run).
    @jax.jit
    def fwd(params, x):
        return srnets_predict(params, x, modes=modes, stages=stages,
                              scale=scale, phase="valid")

    return fwd


def valid_steps(params, valid: SRBenchmark, opt, it: int, logger,
                predict_fn=None, writer=None):
    """Benchmark validation with PNG dumps (ref: sr/1_train_model.py:70-119)."""
    datasets = ["Set5"] if opt.debug else valid.datasets

    if predict_fn is None:
        jfwd = _valid_fwd(opt.modes, opt.stages, opt.scale)
        fwd = lambda x: jfwd(params, x)  # noqa: E731
    else:
        fwd = predict_fn
    for dataset in datasets:
        if dataset not in valid.files:
            continue
        psnrs = []
        result_path = os.path.join(opt.valoutDir, dataset)
        os.makedirs(result_path, exist_ok=True)
        for name, lr, hr in valid.pairs(dataset):
            x = jnp.asarray(
                lr.astype(np.float32).transpose(2, 0, 1)[None] / 255.0
            )
            pred = np.asarray(fwd(x))[0].transpose(1, 2, 0)
            pred = np.round(np.clip(pred, 0, 255)).astype(np.uint8)
            left = rgb2ycbcr(pred)[:, :, 0]
            right = rgb2ycbcr(hr)[:, :, 0]
            psnrs.append(psnr(left, right, opt.scale))
            if it < 10000:
                save_image(os.path.join(result_path, f"{name}_input.png"), lr)
                save_image(os.path.join(result_path, f"{name}_gt.png"), hr)
            save_image(os.path.join(result_path, f"{name}_net.png"), pred)
        avg = float(np.mean(np.asarray(psnrs)))
        logger.info(
            "Iter {} | Dataset {} | AVG Val PSNR: {:02f}".format(
                it, dataset, avg
            )
        )
        if writer is not None:
            writer.add_scalar(f"PSNR_valid/{dataset}", avg, it)


def train(opt) -> dict:
    """Full step-1 training CLI behavior.  Returns the final params."""
    logger_name = "train"
    logger_info(logger_name, os.path.join(opt.expDir, logger_name + ".log"))
    logger = logging.getLogger(logger_name)
    writer = make_summary_writer(opt.expDir)

    n_dev = min(opt.gpuNum, jax.device_count()) if opt.gpuNum > 1 else 1
    mesh = make_mesh(n_dev) if n_dev > 1 else None

    params = init_srnets(jax.random.PRNGKey(0), nf=opt.nf, scale=opt.scale,
                         modes=opt.modes, stages=opt.stages,
                         arch=getattr(opt, "arch", "dense"),
                         depth=getattr(opt, "unitDepth", 0) or None)
    optimizer = make_optimizer(opt.lr0, opt.lr1, opt.totalIter, opt.weightDecay)
    if opt.startIter > 0:
        ckpt = os.path.join(opt.expDir, f"Model_{opt.startIter:06d}.npz")
        params = load_params_npz(ckpt)
        opt_state = optimizer.init(params)
        opt_ckpt = os.path.join(opt.expDir, f"Opt_{opt.startIter:06d}.npz")
        if os.path.exists(opt_ckpt):
            # Full resume: Adam moments + the step counts that drive the
            # cosine-LR phase — a resumed run follows the same trajectory
            # as an uninterrupted one (the reference intended but never
            # shipped this, ref: sr/1_train_model.py:65-66, 157-164).
            opt_state = load_opt_state_npz(opt_ckpt, opt_state)
            logger.info(f"Resumed params+optimizer from iter {opt.startIter}")
        else:
            logger.info(
                f"Resumed params from {ckpt} (no Opt_*.npz — optimizer "
                "state re-initialized; trajectory will differ)"
            )
    else:
        opt_state = optimizer.init(params)
    if mesh is not None:
        params = replicate_tree(mesh, params)
        opt_state = replicate_tree(mesh, opt_state)
    step = make_train_step(optimizer, modes=opt.modes, stages=opt.stages,
                           scale=opt.scale,
                           precision=getattr(opt, "trainPrecision", "f32"))

    provider = Provider(opt.batchSize, opt.workerNum, opt.scale, opt.trainDir,
                        opt.cropSize)
    valid = SRBenchmark(opt.valDir, scale=opt.scale)

    # Losses accumulate ON DEVICE and sync once per display window: a
    # per-iteration float(loss) costs a host round-trip that can exceed the
    # 62 ms step itself on remote-attached TPUs.
    l_accum = jnp.zeros(())
    dT = 0.0
    window_start = time.time()
    accum_samples = 0
    for i in range(opt.startIter + 1, opt.totalIter + 1):
        st = time.time()
        im, lb = provider.next()
        if mesh is not None:
            im, lb = shard_batch(mesh, im, lb)
        else:
            im, lb = jnp.asarray(im), jnp.asarray(lb)
        dT += time.time() - st

        params, opt_state, loss = step(params, opt_state, im, lb)
        l_accum = l_accum + loss
        accum_samples += opt.batchSize

        if i % opt.displayStep == 0:
            avg_loss = float(l_accum) / opt.displayStep  # device sync point
            wall = time.time() - window_start
            logger.info(
                "{} | Iter:{:6d}, Sample:{:6d}, GPixel:{:.2e}, dT:{:.4f}, rT:{:.4f}".format(
                    opt.expDir, i, accum_samples, avg_loss,
                    dT / opt.displayStep,
                    (wall - dT) / opt.displayStep,
                )
            )
            writer.add_scalar("loss_Pixel", avg_loss, i)
            l_accum = jnp.zeros(())
            dT = 0.0
            window_start = time.time()

        if i % opt.saveStep == 0:
            path = os.path.join(opt.expDir, f"Model_{i:06d}.npz")
            save_params_npz(path, jax.device_get(params))
            save_opt_state_npz(
                os.path.join(opt.expDir, f"Opt_{i:06d}.npz"),
                jax.device_get(opt_state),
            )
            logger.info(f"Checkpoint saved {i}")

        if i % opt.valStep == 0:
            valid_steps(params, valid, opt, i, logger, writer=writer)
            writer.flush()

    provider.close()
    writer.close()
    logger.info("Complete")
    return params
