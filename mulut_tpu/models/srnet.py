"""Spatial wrappers: SRNets / DNNets — the trainable LUT-convertible models.

The reference wraps each MuLUT unit in unfold -> per-patch forward -> fold
(ref: common/network.py:137-225).  TPU-first equivalent: the four sampled
pixels of every output site are four *shifted views* of the padded image;
stacking them gives a (B*C*h*w, 4) matrix fed to the tap-MLP, and the
upscale**2 outputs interleave back via reshape/transpose (the fold-with-
stride is exactly a pixel shuffle).  No K*K patch tensor is ever built.

A "model" here is a plain dict:
  params: {"s{stage}_{mode}": unit-param dict}
  static config carried by the caller (modes, stages, scale, nf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.simplex import round_ste
from ..ops.taps import mode_pad, mode_taps
from .blocks import apply_mulut_unit, init_mulut_unit


def init_srnets(key, *, nf: int = 64, scale: int = 4, modes: str = "sdy",
                stages: int = 2) -> dict:
    """Stage x mode registry of MuLUT units (ref: sr/model.py:15-31).

    The last stage upscales by `scale`; earlier stages are x1.
    """
    params = {}
    for s in range(stages):
        upscale = scale if s + 1 == stages else 1
        for mode in modes:
            key, sub = jax.random.split(key)
            params[f"s{s + 1}_{mode}"] = init_mulut_unit(
                sub, nf=nf, upscale=upscale, dense=True
            )
    return params


def unit_upscale(stage: int, stages: int, scale: int) -> int:
    return scale if stage == stages else 1


def srnet_apply(unit_params: dict, x, *, mode: str, upscale: int):
    """Apply one SRNet to a padded image batch.

    Args:
      unit_params: tap-MLP parameters.
      x: (B, C, H, W) float in [0, 1], already replicate-padded bottom/right
        by `mode_pad(mode)` (the caller pads, ref: sr/1_train_model.py:34).

    Returns:
      (B, C, h*upscale, w*upscale) float in (-1, 1), h = H - pad.
    """
    pad = mode_pad(mode)
    B, C, H, W = x.shape
    h, w = H - pad, W - pad
    planes = [x[..., dy : dy + h, dx : dx + w] for dy, dx in mode_taps(mode)]
    taps = jnp.stack(planes, axis=-1)  # (B, C, h, w, 4)
    out = apply_mulut_unit(unit_params, taps.reshape(-1, 4))  # (N, up*up)
    out = out.reshape(B, C, h, w, upscale, upscale)
    out = jnp.moveaxis(out, -2, -3).reshape(B, C, h * upscale, w * upscale)
    return out


def _pad_rot(x, r: int, pad: int):
    """rot90 then replicate-pad bottom/right (ref: sr/1_train_model.py:34)."""
    xr = jnp.rot90(x, r, axes=(-2, -1))
    return jnp.pad(xr, [(0, 0), (0, 0), (0, pad), (0, pad)], mode="edge")


def srnets_predict(params: dict, x, *, modes: str, stages: int, scale: int,
                   phase: str = "train"):
    """Full train-time forward: cascade of stage/mode/rotation ensembles.

    Matches mulut_predict (ref: sr/1_train_model.py:26-45): per rotation the
    unit output is scaled by 127 and STE-rounded; intermediate stages mix with
    avg = len(modes)*4, bias 127, clamp to [0,255] and renormalize; the final
    stage mixes with avg = len(modes), bias 0 (divided by 255 only in the
    train phase — the valid phase returns values in [0, 255]).

    Args:
      x: (B, C, H, W) float32 in [0, 1].
    """
    for s in range(stages):
        stage = s + 1
        upscale = unit_upscale(stage, stages, scale)
        pred = 0.0
        for mode in modes:
            pad = mode_pad(mode)
            unit = params[f"s{stage}_{mode}"]
            for r in range(4):
                out = srnet_apply(unit, _pad_rot(x, r, pad), mode=mode, upscale=upscale)
                out = jnp.rot90(out, (4 - r) % 4, axes=(-2, -1))
                pred = pred + round_ste(out * 127.0)
        if stage == stages:
            x = round_ste(pred / len(modes))
            if phase == "train":
                x = x / 255.0
        else:
            x = round_ste(jnp.clip(pred / (len(modes) * 4) + 127.0, 0, 255)) / 255.0
    return x


def dnnet_apply(unit_params: dict, x, *, mode: str):
    """Denoising/deblocking wrapper: stride-1, no upsampling
    (ref: common/network.py:229-272)."""
    return srnet_apply(unit_params, x, mode=mode, upscale=1)
