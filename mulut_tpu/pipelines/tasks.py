"""Non-SR task pipelines: denoising / deblocking (DNNets) and
demosaicking (DMNet).

The reference ships the MODELS for these tasks (DNNet/DMNet,
ref: common/network.py:229-317) but no training/transfer/eval scripts —
its `sr/` pipeline is SR-only.  This module closes that capability gap
the TPU-native way: the x1 cascade reuses the SR train step at scale=1
(`dnnets_predict` IS `srnets_predict(scale=1)`), LUT caching reuses the
tap-MLP grid forward (`transfer.cache_lut` — the spatial wrapper is the
identity on the 17^4 grid), and deployment runs the same integer simplex
cascade (`ops.lut_cascade_int` at scale=1) or a single-pass bayer-cell
retrieval for demosaicking.

Degradations are generated on the fly from clean images:
  * denoise: additive Gaussian noise, sigma in 8-bit units (the
    reference's `--sigma` flag, ref: common/option.py:19).
  * deblock: JPEG round-trip at quality factor qf (`--qf`, :20).
  * demosaic: RGGB bayer sampling of the RGB image.
"""

from __future__ import annotations

import io

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.srnet import (
    dmnet_apply,
    dnnets_predict,
    init_dmnet,
    init_dnnets,
)
from ..ops.ensemble import lut_cascade_int
from ..ops.simplex import simplex_planes_int
from .train import make_optimizer
from .transfer import cache_lut, transfer_to_luts


# ---------------------------------------------------------------------------
# Degradations (host side, uint8 in/out)
# ---------------------------------------------------------------------------

def add_gaussian_noise(img: np.ndarray, sigma: float,
                       rng: np.random.Generator) -> np.ndarray:
    """Additive Gaussian noise in 8-bit units, clipped (denoise input)."""
    noisy = img.astype(np.float32) + rng.normal(0, sigma, img.shape)
    return np.clip(np.round(noisy), 0, 255).astype(np.uint8)


def jpeg_roundtrip(img: np.ndarray, qf: int) -> np.ndarray:
    """JPEG compress/decompress at quality qf (deblock input)."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=int(qf))
    return np.array(Image.open(buf).convert(
        "RGB" if img.ndim == 3 else "L"
    ))


def bayer_mosaic(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) RGB -> (H, W) RGGB bayer plane (demosaic input)."""
    h, w = img.shape[:2]
    out = np.empty((h, w), img.dtype)
    out[0::2, 0::2] = img[0::2, 0::2, 0]   # R
    out[0::2, 1::2] = img[0::2, 1::2, 1]   # G
    out[1::2, 0::2] = img[1::2, 0::2, 1]   # G
    out[1::2, 1::2] = img[1::2, 1::2, 2]   # B
    return out


# ---------------------------------------------------------------------------
# Denoise / deblock: x1 cascade (DNNets)
# ---------------------------------------------------------------------------

def make_dn_train_step(optimizer, *, modes: str, stages: int):
    """Jitted x1-cascade train step (degraded -> clean MSE)."""

    @jax.jit
    def step(params, opt_state, im, lb):
        im = im.astype(jnp.float32) / 255.0
        lb = lb.astype(jnp.float32) / 255.0

        def loss_fn(p):
            pred = dnnets_predict(p, im, modes=modes, stages=stages,
                                  phase="train")
            return jnp.mean((pred - lb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_dn(clean_batches, *, modes: str = "sdy", stages: int = 2,
             nf: int = 64, iters: int = 100, lr0: float = 1e-3,
             lr1: float = 1e-4, degrade=None, seed: int = 0):
    """Train a denoise/deblock cascade on (B, C, H, W) uint8 clean batches.

    `clean_batches` is an iterator/iterable of uint8 arrays; `degrade` maps
    a clean batch to the network input (defaults to sigma=15 Gaussian).
    Returns (params, losses).
    """
    rng = np.random.default_rng(seed)
    if degrade is None:
        degrade = lambda b: add_gaussian_noise(b, 15.0, rng)  # noqa: E731
    params = init_dnnets(jax.random.PRNGKey(seed), nf=nf, modes=modes,
                         stages=stages)
    optimizer = make_optimizer(lr0, lr1, iters)
    opt_state = optimizer.init(params)
    step = make_dn_train_step(optimizer, modes=modes, stages=stages)
    losses = []
    it = iter(clean_batches)
    for _ in range(iters):
        clean = next(it)
        noisy = degrade(clean)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(noisy),
                                       jnp.asarray(clean))
        losses.append(loss)
    return params, [float(l) for l in losses]


def dn_transfer(params, *, modes: str = "sdy", stages: int = 2,
                interval: int = 4) -> dict:
    """Cache the x1 cascade into LUTs ({"s{n}_{m}": (L**4, 1) int8})."""
    return transfer_to_luts(params, modes=modes, stages=stages,
                            interval=interval)


def dn_lut_apply(luts: dict, img: np.ndarray, *, modes: str = "sdy",
                 stages: int = 2, interval: int = 4) -> np.ndarray:
    """Deploy the cached x1 cascade: (H, W[, C]) uint8 -> same-shape uint8.

    The integer simplex cascade at scale=1 — identical engine and mixing
    semantics to the SR deployment path (ref: sr/4_test_lut.py:263-306
    applied at upscale 1)."""
    chw = img.astype(np.int32)
    if chw.ndim == 3:
        chw = chw.transpose(2, 0, 1)
    dev = {k: jnp.asarray(np.asarray(v, np.int32)) for k, v in luts.items()}
    out = np.asarray(
        lut_cascade_int(dev, jnp.asarray(chw), stages=stages, modes=modes,
                        scale=1, interval=interval)
    )
    if img.ndim == 3:
        out = out.transpose(1, 2, 0)
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Demosaic: single bayer-cell unit (DMNet)
# ---------------------------------------------------------------------------

def make_dm_train_step(optimizer):
    @jax.jit
    def step(params, opt_state, bayer, rgb):
        x = bayer.astype(jnp.float32) / 255.0
        y = rgb.astype(jnp.float32) / 255.0

        def loss_fn(p):
            # unit outputs tanh in (-1, 1); target mapped to the same range
            pred = dmnet_apply(p, x[:, None])
            return jnp.mean((pred - (y * 2.0 - 1.0)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_dm(rgb_batches, *, nf: int = 64, iters: int = 100,
             lr0: float = 1e-3, lr1: float = 1e-4, seed: int = 0):
    """Train the demosaic unit on (B, H, W, 3) uint8 RGB batches."""
    params = init_dmnet(jax.random.PRNGKey(seed), nf=nf)
    optimizer = make_optimizer(lr0, lr1, iters)
    opt_state = optimizer.init(params)
    step = make_dm_train_step(optimizer)
    losses = []
    it = iter(rgb_batches)
    for _ in range(iters):
        rgb = next(it)
        bayer = np.stack([bayer_mosaic(im) for im in rgb])
        rgb_chw = rgb.transpose(0, 3, 1, 2)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(bayer),
                                       jnp.asarray(rgb_chw))
        losses.append(loss)
    return params, [float(l) for l in losses]


def dm_transfer(params, *, interval: int = 4) -> np.ndarray:
    """Cache the demosaic unit: (L**4, 12) int8 (3 channels x 2x2 cell)."""
    return cache_lut(params, interval=interval, dense=False)


def dm_lut_apply(lut: np.ndarray, bayer: np.ndarray, *,
                 interval: int = 4) -> np.ndarray:
    """Deploy the cached demosaic LUT: (H, W) uint8 bayer -> (H, W, 3) uint8.

    Single-pass integer simplex retrieval per non-overlapping 2x2 bayer
    cell (the DMNet unfold geometry, ref: common/network.py:296-317); no
    rotation ensemble — the RGGB pattern is not rotation-invariant.
    """
    q = 2 ** interval
    if bayer.shape[0] % 2 or bayer.shape[1] % 2:
        raise ValueError(
            f"RGGB bayer input needs even H/W, got {bayer.shape[:2]}; "
            "crop the mosaic to even dimensions first"
        )
    h2, w2 = bayer.shape[0] // 2, bayer.shape[1] // 2
    x = jnp.asarray(bayer.astype(np.int32))
    planes = [x[0::2, 0::2], x[0::2, 1::2], x[1::2, 0::2], x[1::2, 1::2]]
    acc = simplex_planes_int(
        jnp.asarray(np.asarray(lut, np.int32)), planes, interval=interval
    )                                             # (h2, w2, 12), q x value
    out = np.asarray(acc, np.float64) / q         # tanh*127 domain
    out = np.clip(np.round(out), -127, 127)
    # invert the training mapping: (-1,1)*127 -> [0,255]
    out = np.clip(np.round((out / 127.0 + 1.0) / 2.0 * 255.0), 0, 255)
    # lanes are (C, py, px) PixelShuffle order — interleave cell pixels back
    out = out.reshape(h2, w2, 3, 2, 2)
    out = out.transpose(0, 3, 1, 4, 2)             # (h2, py, w2, px, C)
    return out.reshape(h2 * 2, w2 * 2, 3).astype(np.uint8)
